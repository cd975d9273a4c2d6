"""Host-side corpus abstractions: Video / Datasplit / Corpus / GroundTruth.

Numpy re-implementation of the reference's data layer
(src/data/corpus.py, derived from slim_mallow): lazy per-video feature
loading with caching, feature/label length-mismatch truncation (tolerance
50 frames, corpus.py:17), background removal, frame subsampling with
repeat-expansion at eval (corpus.py:335-346, :466-472), feature
downscaling, diagnostic feature permutation, and the per-task
accuracy/F1 evaluation driver (corpus.py:405-604).
"""

import copy
import json
import os

import numpy as np

from action_segmentation_tpu.evaluation.accuracy import Accuracy
from action_segmentation_tpu.evaluation.f1 import F1Score
from action_segmentation_tpu.utils import logger, nested_dict_map

FEATURE_LABEL_MISMATCH_TOLERANCE = 50


class Video:
    """One video: lazy features + ground truth + optional constraints."""

    def __init__(
        self,
        feature_root,
        K,
        remove_background,
        *,
        nonbackground_timesteps=None,
        gt=None,
        gt_with_background=None,
        name="",
        cache_features=False,
        has_label=True,
        features_contain_background=True,
        constraints=None,
        feature_permutation_seed=None,
    ):
        assert name
        self._feature_root = feature_root
        self._K = K
        self.name = name
        self._cache_features = cache_features
        self._has_label = has_label
        self._features_contain_background = features_contain_background
        self._constraints = constraints
        self._feature_permutation_seed = feature_permutation_seed
        self._non_background_constraints = None

        if remove_background:
            assert has_label
            assert nonbackground_timesteps is not None
            assert len(nonbackground_timesteps) == len(gt)
        self._remove_background = remove_background
        self._nonbackground_timesteps = nonbackground_timesteps

        self._features = None
        self._n_frames = None
        self._gt = gt if gt is not None else []
        self._gt_with_background = gt_with_background
        self._updated_length = False

    def load_features(self):
        raise NotImplementedError("should be implemented by subclasses")

    @property
    def has_label(self):
        return self._has_label

    @property
    def constraints(self):
        if self._remove_background and self._constraints is not None:
            if self._non_background_constraints is None:
                tnb = self._truncated_nonbackground_timesteps()
                constraints = self._constraints[: self.n_frames()]
                self._non_background_constraints = constraints[tnb]
            return self._non_background_constraints
        return self._constraints

    def features(self):
        self._check_truncation()
        if self._cache_features:
            if self._features is None:
                self._features = self._process_features(self.load_features())
            features = self._features
        else:
            features = self._process_features(self.load_features())
        if self._feature_permutation_seed is not None:
            state = np.random.RandomState(self._feature_permutation_seed)
            permutation = np.arange(features.shape[1])
            state.shuffle(permutation)
            features = features[:, permutation]
        return features

    def n_frames(self):
        return self._n_frames

    def approx_n_frames(self):
        """Cheap length estimate (no feature IO) for batching sort keys;
        may exceed the true sample length by at most the feature/label
        mismatch tolerance (50 frames) before truncation applies."""
        if self._remove_background and self._nonbackground_timesteps is not None:
            return len(self._nonbackground_timesteps)
        if self._gt_with_background is not None:
            return len(self._gt_with_background)
        return self._n_frames or 0

    def _check_truncation(self):
        if not self._has_label:
            return
        n_frames = self.n_frames()
        if n_frames is None:
            self._process_features(self.load_features())
            n_frames = self.n_frames()
        assert n_frames is not None
        if not self._updated_length and (
            len(self._gt_with_background) != n_frames
            or not self._features_contain_background
        ):
            self._updated_length = True
            assert (
                len(self._gt_with_background) - n_frames
                <= FEATURE_LABEL_MISMATCH_TOLERANCE
            ), "len(gt_with_background) = {}, n_frames = {}".format(
                len(self._gt_with_background), n_frames
            )
            self._n_frames = min(len(self._gt_with_background), n_frames)
            self._features = None

    def gt(self):
        self._check_truncation()
        if self._remove_background:
            tnb = self._truncated_nonbackground_timesteps()
            gt = self._gt_with_background[: self.n_frames()]
            return [gt[ix] for ix in tnb]
        return self._gt[: self.n_frames()]

    def gt_with_background(self):
        self._check_truncation()
        return self._gt_with_background[: self.n_frames()]

    def _truncated_nonbackground_timesteps(self):
        return [t for t in self._nonbackground_timesteps if t < self.n_frames()]

    def _process_features(self, features):
        if self._n_frames is None:
            if self._features_contain_background:
                self._n_frames = features.shape[0]
            else:
                self._n_frames = len(self._gt_with_background)
        if not self._features_contain_background:
            return features
        features = features[: self.n_frames()]
        if self._remove_background:
            features = features[self._truncated_nonbackground_timesteps()]
        return features


class Datasplit:
    def __init__(
        self,
        corpus,
        remove_background,
        full=True,
        subsample=1,
        feature_downscale=1.0,
        feature_permutation_seed=None,
    ):
        self._corpus = corpus
        self._remove_background = remove_background
        self._full = full
        self._feature_permutation_seed = feature_permutation_seed
        self.return_stat = {}
        self._videos_by_task = {}
        self._gt2label = None
        self._label2gt = {}
        self.groundtruth = None
        self._K_by_task = None
        self._load_ground_truth_and_videos(remove_background)
        assert self.groundtruth is not None
        assert len(self._videos_by_task) != 0
        assert self._K_by_task is not None
        self._tasks_and_video_names = list(
            sorted(
                (task_name, video_name)
                for task_name, vid_dict in self._videos_by_task.items()
                for video_name in vid_dict
            )
        )
        self._tasks_by_video = {
            video_name: task_name for task_name, video_name in self._tasks_and_video_names
        }
        self.subsample = subsample
        self.feature_downscale = feature_downscale

    @property
    def corpus(self):
        return self._corpus

    @property
    def remove_background(self):
        return self._remove_background

    @property
    def videos_by_task(self):
        return self._videos_by_task

    def __len__(self):
        return len(self._tasks_and_video_names)

    def approx_length(self, task_and_video_name):
        """Cheap per-video length for length-sorted batching (no feature
        IO; relative order is what matters for bucketing)."""
        task_name, video_name = task_and_video_name
        return self._videos_by_task[task_name][video_name].approx_n_frames()

    def __getitem__(self, task_and_video_name):
        task_name, video_name = task_and_video_name
        video_obj = self._videos_by_task[task_name][video_name]
        try:
            features = video_obj.features()
        except Exception as e:
            logger.debug(
                "exception with task and video {}: {}".format(task_and_video_name, e)
            )
            return None
        task_indices = self.corpus.indices_by_task(task_name)
        if self.remove_background:
            task_indices = set(task_indices) - set(self.corpus._background_indices)
        task_indices = sorted(task_indices)
        constraints = video_obj.constraints

        if video_obj.has_label:
            gt_single = [gt_t[0] for gt_t in video_obj.gt()]

        if self.subsample != 1:
            subsample_indices = (
                np.arange(features.shape[0] // self.subsample) * self.subsample
            )
            if video_obj.has_label:
                gt_single_sampled = list(np.array(gt_single)[subsample_indices])
            features = features[subsample_indices]
            if constraints is not None:
                constraints = constraints[subsample_indices]
        else:
            if video_obj.has_label:
                gt_single_sampled = gt_single

        if self.feature_downscale != 1.0:
            features = features / self.feature_downscale

        data = {
            "task_name": task_name,
            "video_name": video_name,
            "features": np.asarray(features, np.float32),
            "task_indices": np.asarray(task_indices, np.int64),
        }
        if constraints is not None:
            data["constraints"] = np.asarray(constraints, np.float32)
        if video_obj.has_label:
            data.update(
                {
                    "gt": video_obj.gt(),
                    "gt_single_unsampled": np.asarray(gt_single, np.int64),
                    "gt_single": np.asarray(gt_single_sampled, np.int64),
                    "gt_with_background": video_obj.gt_with_background(),
                }
            )
        return data

    def _get_by_index(self, index):
        return self.__getitem__(self._tasks_and_video_names[index])

    @property
    def feature_dim(self):
        return self._get_by_index(0)["features"].shape[1]

    def _load_ground_truth_and_videos(self, remove_background):
        raise NotImplementedError("subclasses should implement")

    def get_allowed_starts_and_transitions(self):
        raise NotImplementedError("subclasses should implement")

    def get_ordered_indices_no_background(self):
        raise NotImplementedError("subclasses should implement")

    def canonicalize_background(self, index):
        if index in self._corpus._background_indices:
            return self._corpus._background_indices[0]
        return index

    def accuracy_corpus(
        self,
        optimal_assignment,
        prediction_function,
        prefix="",
        verbose=True,
        compare_to_folder=None,
    ):
        """Per-task Accuracy + F1 evaluation (reference corpus.py:405-604)."""
        stats_by_task = {}

        y_true_all = y_pred_all = None
        if compare_to_folder is not None:
            if os.path.exists(os.path.join(compare_to_folder, "y_true.json")):
                with open(os.path.join(compare_to_folder, "y_true.json")) as f:
                    y_true_all = json.load(f)
                with open(os.path.join(compare_to_folder, "y_pred.json")) as f:
                    y_pred_all = json.load(f)

        for task in self._videos_by_task:
            if verbose:
                logger.debug("computing accuracy for task {}".format(task))
            accuracy = Accuracy(verbose=verbose, corpus=self._corpus)
            f1_score = F1Score(
                K=self._K_by_task[task],
                n_videos=len(self._videos_by_task[task]),
                verbose=verbose,
            )
            long_gt = []
            long_pr = []

            compare_accuracy = None
            if compare_to_folder is not None:
                compare_accuracy = Accuracy(verbose=verbose, corpus=self._corpus)
                task_mapping = {}

            def load_predictions(video_name):
                if y_true_all is not None:
                    return {
                        "y_true": np.array(y_true_all[str(task)][video_name]),
                        "y_pred": np.array(y_pred_all[str(task)][video_name]),
                    }
                npy = os.path.join(compare_to_folder, "{}_y_true.npy".format(video_name))
                if os.path.exists(npy):
                    return {
                        "y_true": np.load(npy),
                        "y_pred": np.load(
                            os.path.join(
                                compare_to_folder, "{}_y_pred.npy".format(video_name)
                            )
                        ),
                    }
                with open(
                    os.path.join(compare_to_folder, "{}.json".format(video_name))
                ) as f:
                    return {k: np.array(v) for k, v in json.load(f).items()}

            for video_name, video in self._videos_by_task[task].items():
                gt = list(video.gt())
                if prediction_function is not None:
                    pred = list(prediction_function(video))
                    if self.subsample != 1:
                        pred = list(
                            np.array(pred + [pred[-1]]).repeat(self.subsample)[: len(gt)]
                        )
                        assert len(gt) == len(pred)
                    if self.corpus.annotate_background_with_previous:
                        gt = [
                            [self.canonicalize_background(ix) for ix in gt_t]
                            for gt_t in gt
                        ]
                        pred = [self.canonicalize_background(ix) for ix in pred]
                    accuracy.add_gt_labels(gt)
                    accuracy.add_predicted_labels(pred)
                    long_gt += gt
                    long_pr += pred

                if compare_to_folder is not None:
                    pred_data = load_predictions(video_name)
                    trues = pred_data["y_true"].argmax(axis=1)
                    assert len(trues) == len(video.gt())
                    for t, g in zip(trues, video.gt()):
                        g = g[0]
                        if t in task_mapping:
                            assert task_mapping[t] == g
                        else:
                            task_mapping[t] = g

            if compare_to_folder is not None:
                for video_name, video in self._videos_by_task[task].items():
                    pred_data = load_predictions(video_name)
                    trues = pred_data["y_true"].argmax(axis=1)
                    preds = pred_data["y_pred"].argmax(axis=1)
                    compare_accuracy.add_gt_labels([[task_mapping[t]] for t in trues])
                    compare_accuracy.add_predicted_labels(
                        [task_mapping[p] for p in preds]
                    )

            named_accuracies = []
            if prediction_function is not None:
                named_accuracies.append(("model", accuracy))
                accuracy_to_return = accuracy
            else:
                accuracy_to_return = compare_accuracy
            if compare_to_folder is not None:
                named_accuracies.append(
                    ("comparison: {}".format(compare_to_folder), compare_accuracy)
                )

            for acc_name, acc in named_accuracies:
                acc.mof(
                    optimal_assignment,
                    possible_gt_labels=self.corpus.indices_by_task(task),
                )
                if acc_name == "model":
                    self._gt2label = acc._gt2cluster
                    self._label2gt = {}
                    for key, val in self._gt2label.items():
                        try:
                            self._label2gt[val[0]] = key
                        except IndexError:
                            pass
                if verbose:
                    logger.debug("%s Task: %s" % (prefix, task))
                    logger.debug("%s MoF val: " % prefix + str(acc.mof_val()))
                acc.mof_classes()
                acc.iou_classes()
                acc.levenshtein()
                acc.single_step_recall()

            self.return_stat = accuracy_to_return.stat()

            if prediction_function is not None:
                f1_score.set_gt(long_gt)
                f1_score.set_pr(long_pr)
                f1_score.set_gt2pr(self._gt2label)
                f1_score.f1()
                for key, val in f1_score.stat().items():
                    self.return_stat[key] = val

            stats = accuracy_to_return.stat()
            stats["num_videos"] = np.array([len(self._videos_by_task[task]), 1])
            if compare_to_folder is not None:
                comparison_stats = compare_accuracy.stat()
                for k in (
                    "mof",
                    "mof_bg",
                    "mof_non_bg",
                    "step_recall_non_bg",
                    "mean_normed_levenshtein",
                    "f1",
                    "f1_non_bg",
                    "pred_background",
                ):
                    stats["comparison_{}".format(k)] = comparison_stats[k]
                stats["comparison_center_step_recall_non_bg"] = comparison_stats[
                    "step_recall_non_bg"
                ]
            stats_by_task[task] = accuracy_to_return.stat()
        return stats_by_task


class Corpus:
    def __init__(self, background_labels, cache_features=False):
        self.label2index = {}
        self.index2label = {}
        self.component2index = {}
        self.index2component = {}
        self.label_indices2component_indices = {}
        self._cache_features = cache_features
        self._labels_frozen = False
        self._background_labels = background_labels
        self._background_indices = []
        for label in background_labels:
            self._background_indices.append(self._index(label))
        self._indices_by_task = {}
        self._load_mapping()
        self._labels_frozen = True

    @property
    def n_classes(self):
        return len(self.label2index)

    @property
    def n_components(self):
        return len(self.component2index)

    def _index(self, label):
        if label not in self.label2index:
            assert not self._labels_frozen, "indexing {} after freeze".format(label)
            label_idx = len(self.label2index)
            self.label2index[label] = label_idx
            self.index2label[label_idx] = label
            component_indices = []
            for component_label in self._get_components_for_label(label):
                component_indices.append(self._index_component(component_label))
            self.label_indices2component_indices[label_idx] = sorted(component_indices)
        else:
            label_idx = self.label2index[label]
        return label_idx

    def _index_component(self, component_label):
        if component_label not in self.component2index:
            assert not self._labels_frozen
            component_idx = len(self.component2index)
            self.component2index[component_label] = component_idx
            self.index2component[component_idx] = component_label
        else:
            component_idx = self.component2index[component_label]
        return component_idx

    def _get_components_for_label(self, label):
        raise NotImplementedError()

    def indices_by_task(self, task):
        return list(sorted(self._indices_by_task[task]))

    def update_indices_by_task(self, task, indices):
        self._indices_by_task.setdefault(task, set()).update(indices)

    def _load_mapping(self):
        raise NotImplementedError("subclasses should implement")

    def get_datasplit(self, remove_background, full=True):
        raise NotImplementedError("subclasses should implement")


class GroundTruth:
    def __init__(self, corpus, task_names, remove_background):
        self._corpus = corpus
        self._task_names = task_names
        self._remove_background = remove_background
        self.gt_by_task = {}
        self.gt_with_background_by_task = {}
        self.order_by_task = {}
        self.order_with_background_by_task = {}
        self.nonbackground_timesteps_by_task = {}
        self.load_gt_and_remove_background()

    def _load_gt(self):
        raise NotImplementedError("_load_gt")

    def load_gt_and_remove_background(self):
        self._load_gt()
        self.gt_with_background_by_task = self.gt_by_task
        self.order_with_background_by_task = self.order_by_task
        if self._remove_background:
            self.remove_background()
        for task, gt_dict in self.gt_by_task.items():
            label_set = set()
            for vid, gt in gt_dict.items():
                for gt_t in gt:
                    label_set.update(gt_t)
            self._corpus.update_indices_by_task(task, label_set)

    def remove_background(self):
        self.gt_with_background_by_task = copy.deepcopy(self.gt_by_task)
        self.order_with_background_by_task = copy.deepcopy(self.order_by_task)
        bkg = set(self._corpus._background_indices)

        def nonbkg_indices(task, video, gt):
            return [t for t, gt_t in enumerate(gt) if gt_t[0] not in bkg]

        self.nonbackground_timesteps_by_task = nested_dict_map(
            self.gt_by_task, nonbkg_indices
        )

        def rm_bkg_from_indices(task, video, gt):
            nbi = set(self.nonbackground_timesteps_by_task[task][video])
            new_gt = [val for ix, val in enumerate(gt) if ix in nbi]
            assert not any(ix in new_gt for ix in bkg)
            return new_gt

        def rm_bkg_from_order(task, video, order):
            return [t for t in order if t[0] not in bkg]

        self.gt_by_task = nested_dict_map(self.gt_by_task, rm_bkg_from_indices)
        self.order_by_task = nested_dict_map(self.order_by_task, rm_bkg_from_order)
