.PHONY: test bench native tpu-check scale-check clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	g++ -O3 -shared -fPIC -o native/libeditdistance.so native/editdistance.cpp

tpu-check:
	python scripts/tpu_kernel_check.py

tpu-e2e:
	python scripts/tpu_e2e_check.py

scale-check:
	python scripts/tpu_scale_check.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
