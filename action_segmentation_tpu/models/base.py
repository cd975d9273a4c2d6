"""Model API, optimizer plumbing, and training-loop utilities.

Counterpart of the reference's src/models/model.py: the abstract
``Model.fit/predict`` contract (model.py:80-85), the Adam +
reduce-on-plateau optimizer recipe (model.py:27-39), and the shared
training flags (model.py:7-24). Optimization is optax; the plateau
schedule is a small host-side controller feeding a learning-rate scalar
into the jitted update step.
"""

import jax
import jax.numpy as jnp
import optax


def add_training_args(parser):
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--batch_accumulation", type=int, default=1)
    parser.add_argument("--lr", type=float, default=5e-3)
    parser.add_argument("--workers", type=int, default=0)
    parser.add_argument("--max_grad_norm", type=float, default=10)
    parser.add_argument("--print_every", type=int, default=100)
    parser.add_argument("--no_reduce_plateau", action="store_true")
    parser.add_argument("--reduce_plateau_factor", type=float, default=0.2)
    parser.add_argument("--reduce_plateau_patience", type=float, default=1)
    parser.add_argument("--reduce_plateau_min_lr", type=float, default=1e-4)
    parser.add_argument("--train_limit", type=int)
    parser.add_argument("--dev_decode_frequency", type=int, default=1)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument(
        "--profile_dir",
        help="write a jax profiler trace of the first training epoch here",
    )
    parser.add_argument(
        "--checkpoint_dir",
        help="orbax checkpoint directory (periodic pytree checkpoints + resume)",
    )
    parser.add_argument("--checkpoint_every", type=int, default=5)
    parser.add_argument(
        "--resume", action="store_true", help="resume from latest orbax checkpoint"
    )
    parser.add_argument(
        "--data_parallel",
        action="store_true",
        help="shard training batches over all devices (data-parallel mesh)",
    )
    parser.add_argument(
        "--model_parallel",
        type=int,
        default=1,
        help="RETIRED (round 3): class-table tensor parallelism was "
        "removed — values > 1 raise; see docs/DESIGN.md §6",
    )


class ReduceLROnPlateau:
    """Host-side plateau LR controller (torch ReduceLROnPlateau semantics:
    mode=min, threshold=1e-5 relative, cooldown=0)."""

    def __init__(self, lr, factor=0.2, patience=1, min_lr=1e-4, threshold=1e-5):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric):
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


class DevicePlateauLR:
    """On-device ReduceLROnPlateau with the exact semantics of the host
    controller above (mode=min, relative threshold, cooldown=0).

    State and the produced learning rate are 0-d jax arrays, so the
    training loop can thread the next epoch's lr into the jitted update
    step WITHOUT fetching the epoch loss to the host — on this
    environment every dispatch->fetch round trip costs ~0.5 s
    (CLAUDE.md round-trip rule), and the per-epoch loss fetch was the
    realistic-epoch bottleneck (scripts/epoch_decompose.py). ``lr`` is
    readable/settable as a float for checkpoint meta / resume.
    """

    def __init__(self, lr, factor=0.2, patience=1, min_lr=1e-4, threshold=1e-5):
        self.factor = float(factor)
        self.patience = int(patience)
        self.min_lr = float(min_lr)
        self.threshold = float(threshold)
        self.state = {
            "lr": jnp.float32(lr),
            "best": jnp.float32(jnp.inf),
            "num_bad": jnp.int32(0),
        }
        factor_, patience_, min_lr_, threshold_ = (
            self.factor, self.patience, self.min_lr, self.threshold
        )

        @jax.jit
        def _step(state, metric):
            # NaN metric compares False -> not improved (host parity)
            improved = metric < state["best"] * (1.0 - threshold_)
            best = jnp.where(improved, metric, state["best"])
            num_bad = jnp.where(improved, 0, state["num_bad"] + 1)
            trigger = (~improved) & (num_bad > patience_)
            lr = jnp.where(
                trigger, jnp.maximum(state["lr"] * factor_, min_lr_), state["lr"]
            )
            num_bad = jnp.where(trigger, 0, num_bad)
            return {"lr": lr, "best": best, "num_bad": num_bad}

        self._step = _step

    def step(self, metric):
        """metric: 0-d array (or float); returns the new lr as a 0-d
        array. Pure dispatch — never forces a device fetch."""
        self.state = self._step(self.state, jnp.asarray(metric, jnp.float32))
        return self.state["lr"]

    @property
    def lr(self):
        return float(self.state["lr"])

    @lr.setter
    def lr(self, value):
        self.state = dict(self.state, lr=jnp.float32(value))


def make_optimizer(args, device_scheduler=False):
    """(optax transform, plateau scheduler or None).

    The transform excludes the learning rate (applied explicitly in the
    train step so the plateau schedule can change it without rebuilding
    optimizer state) and includes the grad-norm clip. With
    ``device_scheduler`` the plateau controller is the on-device
    DevicePlateauLR (identical semantics; no per-epoch loss fetch).
    """
    tx = optax.chain(
        optax.clip_by_global_norm(args.max_grad_norm)
        if args.max_grad_norm is not None
        else optax.identity(),
        optax.scale_by_adam(),
        optax.scale(-1.0),
    )
    sched_cls = DevicePlateauLR if device_scheduler else ReduceLROnPlateau
    scheduler = (
        None
        if args.no_reduce_plateau
        else sched_cls(
            args.lr,
            factor=args.reduce_plateau_factor,
            patience=args.reduce_plateau_patience,
            min_lr=args.reduce_plateau_min_lr,
        )
    )
    return tx, scheduler


def apply_lr(updates, lr):
    return jax.tree_util.tree_map(lambda u: u * lr, updates)


def mask_grads(grads, trainable):
    """Zero the gradients of frozen leaves (module.trainable_mask).

    EVERY optimizer-feeding step — single-device and mesh alike — must
    apply this before tx.update: relying on frozen leaves having
    structurally-zero grads (true today only for the stop_gradient'ed
    gaussian_cov) would silently train a newly-frozen parameter on
    whichever path forgot the mask."""
    return jax.tree_util.tree_map(
        lambda g, t: g if t else jnp.zeros_like(g), grads, trainable
    )


def global_norm(tree):
    return jnp.sqrt(
        sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(tree))
    )


def fold_key(base_rng, epoch, bix):
    """Per-batch PRNG key derived INSIDE the jitted step from the fit's
    base key and the (epoch, batch) coordinates — no per-batch
    jax.random.split program on the host (each eagerly dispatched
    program pays a tunnel round trip at drain time), and resume at
    epoch E reproduces the uninterrupted run's keys exactly (the old
    sequential split chain restarted from the fit() call, so a resumed
    chain was offset by the already-consumed batches). Shared by the
    single-device steps/scans (models/semimarkov.py) and the sharded
    mesh steps/scans (parallel/mesh.py) — dp==single trajectory parity
    depends on every path deriving identical keys."""
    return jax.random.fold_in(jax.random.fold_in(base_rng, epoch), bix)


def fold_stats(stats, loss, aux, bw):
    """Epoch-stats fold (count, loss_sum, nll*B, kl*B, log_det*B) as a
    5-scalar device carry threaded through the per-batch step — the
    epoch summary and the print_every log line read the carry without
    any separate per-batch bookkeeping program."""
    return (
        stats[0] + 1.0,
        stats[1] + loss,
        stats[2] + aux["nll"] * bw,
        stats[3] + aux["kl"] * bw,
        stats[4] + aux["log_det"] * bw,
    )


class Model:
    """Abstract model interface (reference model.py:80-85)."""

    @classmethod
    def add_args(cls, parser):
        raise NotImplementedError()

    @classmethod
    def from_args(cls, args, train_data):
        raise NotImplementedError()

    def fit(self, train_data, use_labels, callback_fn=None):
        raise NotImplementedError()

    def predict(self, test_data):
        raise NotImplementedError()
