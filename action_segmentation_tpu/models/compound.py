"""Compound (neural) HSMM parameterization with optional VAE latent.

Counterpart of the reference's ComponentSemiMarkovModule
(semimarkov_modules.py:699-970; structure after Kim's Compound PCFG):
classes embed as the mean of their component embeddings, and MLP heads
produce initial/transition logits, emission means, and Poisson length
log-rates, optionally conditioned on a per-video latent z inferred by a
BiLSTM encoder (KL enters the unsupervised loss).

The reference's per-class EmbeddingBag gathers become one dense
(n_classes, n_components) row-normalized multi-hot matmul, so class
embeddings for any `valid_classes` subset are a gather of a single
matmul's rows — no ragged host loops.
"""

import jax
import jax.numpy as jnp
import numpy as np

from action_segmentation_tpu import BIG_NEG
from action_segmentation_tpu.models import rnn
from action_segmentation_tpu.models.nn import (
    linear as _linear,
    residual_mlp_apply as _residual_mlp,
    residual_mlp_init,
    xavier_uniform as _xavier,
)
from action_segmentation_tpu.models.semimarkov import GaussianHsmm
from action_segmentation_tpu.ops.distributions import gaussian_emission_log_probs, poisson_length_log_probs


def _linear_init(rng, in_f, out_f, xavier=True):
    from action_segmentation_tpu.models.nn import linear_init

    # xavier weights + torch-default uniform biases, matching the
    # reference's dim>1-only override (semimarkov_modules.py:814-816)
    return linear_init(rng, in_f, out_f, xavier=xavier)


def _residual_mlp_init(rng, in_dim, hidden, out_dim, n_residual):
    return residual_mlp_init(rng, in_dim, hidden, out_dim, n_residual, xavier=True)


class ComponentHsmm(GaussianHsmm):
    """Neural/compound HSMM factors; shares the constraint/merge plumbing
    and DP interface of GaussianHsmm but produces per-instance (batched)
    factors when a latent z is active."""

    batched_factors = True

    @classmethod
    def add_args(cls, parser):
        parser.add_argument("--sm_component_decompose_steps", action="store_true")
        parser.add_argument("--sm_component_mean_layers", type=int, default=2)
        parser.add_argument("--sm_component_length_layers", type=int, default=2)
        parser.add_argument("--sm_component_embedding_dim", type=int, default=100)
        parser.add_argument("--sm_component_z_dim", type=int, default=0)
        parser.add_argument("--sm_component_z_hidden_dim", type=int, default=100)
        parser.add_argument(
            "--no_sm_compound_structure",
            action="store_false",
            dest="sm_compound_structure",
        )
        parser.add_argument("--seq_num_layers_component", type=int, default=2)
        parser.add_argument(
            "--sm_reference_pooling",
            action="store_true",
            help="reproduce the reference's VAE-encoder max-pool over "
            "ZERO-PADDED frames (semimarkov_modules.py:843-858 + "
            "sequential.py:26-30): videos shorter than the batch max "
            "have every pooled dimension clamped at >= 0, so z (hence "
            "decode) depends on the batch composition. Default is the "
            "masked pool (real frames only) — padding-invariant, and "
            "identical on unpadded batches. Use this flag when decoding "
            "a migrated reference model whose batched outputs must match "
            "frame-for-frame.",
        )

    def __init__(
        self,
        args,
        n_classes,
        n_components,
        class_to_components,
        feature_dim,
        allow_self_transitions=False,
        per_class_bias=True,
        allowed_starts=None,
        allowed_transitions=None,
        allowed_ends=None,
        merge_classes=None,
        seed=0,
    ):
        self.n_components = n_components
        self.embedding_dim = args.sm_component_embedding_dim
        self.z_dim = args.sm_component_z_dim
        self.embedding_and_z_dim = self.embedding_dim + self.z_dim
        self.compound_structure = getattr(args, "sm_compound_structure", True)
        self.structure_uses_z = self.compound_structure and self.z_dim > 0
        self.per_class_bias = per_class_bias
        # dense row-normalized class -> components membership
        member = np.zeros((n_classes, n_components), np.float32)
        for cls, comps in class_to_components.items():
            for comp in comps:
                member[cls, comp] = 1.0
        member /= np.maximum(member.sum(axis=1, keepdims=True), 1.0)
        self.class_component_matrix = jnp.asarray(member)

        super().__init__(
            args,
            n_classes,
            feature_dim,
            allow_self_transitions=allow_self_transitions,
            allowed_starts=allowed_starts,
            allowed_transitions=allowed_transitions,
            allowed_ends=allowed_ends,
            merge_classes=merge_classes,
            seed=seed,
        )

    def init_params(self, rng):
        args = self.args
        e = self.embedding_dim
        se = self.embedding_and_z_dim if self.compound_structure else self.embedding_dim
        ez = self.embedding_and_z_dim
        keys = jax.random.split(rng, 12)
        params = {
            "initial_embeddings": _xavier(keys[0], (self.n_components, e)),
            "transition_embeddings": _xavier(keys[1], (self.n_components, e)),
            "emission_embeddings": _xavier(keys[2], (self.n_components, e)),
            "length_embeddings": _xavier(keys[3], (self.n_components, e)),
            "initial_weights": _linear_init(keys[4], se, 1),
            "transition_weights": _linear_init(keys[5], se, se),
            "emission_mean_mlp": _residual_mlp_init(
                keys[6], ez, e, self.feature_dim, args.sm_component_mean_layers
            ),
            "emission_mean_bias": jnp.zeros(self.feature_dim),
            "length_mlp": _residual_mlp_init(
                keys[7], se, e, 1, args.sm_component_length_layers
            ),
            "gaussian_cov": jnp.ones(self.feature_dim, jnp.float32),
        }
        if self.per_class_bias:
            params["initial_bias"] = jnp.zeros(self.n_classes)
            params["transition_bias"] = jnp.zeros(self.n_classes)
            params["length_bias"] = jnp.zeros(self.n_classes)
        if self.z_dim > 0:
            # xavier_w: the reference's dim>1 override loop also hits
            # the encoder LSTM's weight matrices
            params["encoder"] = rnn.lstm_init(
                keys[8],
                self.feature_dim,
                args.sm_component_z_hidden_dim // 2,
                num_layers=getattr(args, "seq_num_layers_component", 2),
                xavier_w=True,
            )
            params["encoder_to_params"] = _linear_init(
                keys[9], args.sm_component_z_hidden_dim, self.z_dim * 2, xavier=True
            )
        if getattr(args, "sm_feature_projection", False):
            from action_segmentation_tpu.models import flow as nice_flow

            params["feature_projector"] = nice_flow.nice_init(
                keys[10], args, self.feature_dim
            )
        return params

    def initialize_gaussian(self, feature_list):
        """Moment init in the emission's INPUT space: with the NICE
        feature projector active, moments come from projected features
        — the reference's component module inherits exactly that
        behavior (semimarkov_modules.py:263-274). gaussian_cov is
        frozen, so a raw-space variance would mis-scale emission
        log-probs for the entire run."""
        from action_segmentation_tpu.models import flow as nice_flow

        feats = np.concatenate([np.asarray(f) for f in feature_list], axis=0)
        if "feature_projector" in self.params:
            feats = np.asarray(
                nice_flow.nice_apply(
                    self.params["feature_projector"], jnp.asarray(feats)
                )[0]
            )
        self.params["emission_mean_bias"] = jnp.asarray(
            feats.mean(axis=0), jnp.float32
        )
        self.params["gaussian_cov"] = jnp.asarray(
            feats.var(axis=0, ddof=1), jnp.float32
        )

    def fit_supervised(self, feature_list, label_list):
        raise NotImplementedError("closed-form fit not supported for component model")

    # ----- latent ------------------------------------------------------

    def _get_z_and_kl(self, params, features, lengths, rng, use_mean,
                      key_offset=0, axis_name=None):
        B = features.shape[0]
        if self.z_dim == 0:
            return (
                jnp.zeros((B, 1), jnp.float32),
                jnp.zeros((B,), jnp.float32),
            )
        encoded = rnn.lstm_apply(params["encoder"], features, lengths)
        frame_mask = (
            jnp.arange(features.shape[1])[None, :] < lengths[:, None]
        )[:, :, None]
        if getattr(self.args, "sm_reference_pooling", False):
            # reference-exact pooling (--sm_reference_pooling): torch's
            # pad_packed_sequence zero-fills frames past each video's
            # length up to the BATCH max, and the reference max-pools
            # over that window (semimarkov_modules.py:843-858), clamping
            # shorter videos' pooled activations at >= 0. Our buffer is
            # bucket-padded wider than the batch max, so the window is
            # cut at max(lengths) to match the reference batch exactly.
            # Under shard_map the local max is NOT the batch max —
            # pmax over the data axis so dp pooling windows match the
            # single-device / reference batch (dp==single parity).
            batch_max = jnp.max(lengths)
            if axis_name is not None:
                batch_max = jax.lax.pmax(batch_max, axis_name)
            window = (
                jnp.arange(features.shape[1])[None, :, None] < batch_max
            )
            enc0 = jnp.where(frame_mask, encoded, 0.0)
            pooled = jnp.max(jnp.where(window, enc0, -jnp.inf), axis=1)
        else:
            # masked max (default): pooling over zero-padded frames
            # would clamp every dimension at >= 0 AND make z depend on
            # the batch's pad width
            pooled = jnp.max(jnp.where(frame_mask, encoded, -jnp.inf), axis=1)
        stats = _linear(params["encoder_to_params"], pooled)
        mean, logvar = stats[:, : self.z_dim], stats[:, self.z_dim :]
        # per-video keys: fold the step key with each instance's GLOBAL
        # batch index (key_offset = shard_index * local_B under
        # shard_map), so z-noise is identical under any device count
        idx = key_offset + jnp.arange(B)
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(idx)
        eps = jax.vmap(lambda k: jax.random.normal(k, (self.z_dim,)))(keys)
        z = jnp.where(use_mean, mean, jnp.exp(0.5 * logvar) * eps + mean)
        kl = -0.5 * jnp.sum(logvar - mean**2 - jnp.exp(logvar) + 1.0, axis=1)
        return z, kl

    def _embed(self, params, name, vc, with_z, z):
        """(B|1, C_sub, E[+Z]) class embeddings for the subset `vc`."""
        emb = (self.class_component_matrix @ params[name])[vc]  # (C_sub, E)
        emb = emb[None]  # (1, C_sub, E)
        if with_z and self.z_dim > 0:
            B = z.shape[0]
            C_sub = emb.shape[1]
            emb = jnp.broadcast_to(emb, (B, C_sub, emb.shape[-1]))
            zz = jnp.broadcast_to(z[:, None, :], (B, C_sub, z.shape[-1]))
            emb = jnp.concatenate([emb, zz], axis=-1)
        return emb

    # ----- factors ------------------------------------------------------

    def compute_potentials(
        self, params, features, lengths, vc, constraints_add, end_allowed, rng,
        use_mean_z, key_offset=0, axis_name=None,
    ):
        B = features.shape[0]
        C_sub = vc.shape[0]
        # vc == -1 marks shape padding (class-count bucketing): masked
        # to BIG_NEG before every softmax, gathered with a clipped index
        pad = vc < 0
        vcs = jnp.where(pad, 0, vc)
        mvc = jnp.asarray(self.merge_map)[vcs] if self.merge_map is not None else vcs

        feats, log_det = self.project_features(params, features, lengths)
        # z encodes the RAW features: the reference calls set_z before
        # the flow projector runs (semimarkov_modules.py:566-571) —
        # caught by test_export_to_reference_decode, which pairs the
        # compound model with a flow for the first time
        z, kl = self._get_z_and_kl(
            params, features, lengths, rng, use_mean_z,
            key_offset=key_offset, axis_name=axis_name,
        )

        # initial: w . embed(class) (+ class bias), masked log-softmax
        init_emb = self._embed(params, "initial_embeddings", vcs, self.structure_uses_z, z)
        x = _linear(params["initial_weights"], init_emb)[..., 0]  # (B|1, C_sub)
        if self.init_dis is not None:
            x = jnp.where(jnp.asarray(self.init_dis)[vcs][None], BIG_NEG, x)
        if self.per_class_bias:
            x = x + params["initial_bias"][vcs][None]
        x = jnp.where(pad[None], BIG_NEG, x)
        init = jax.nn.log_softmax(x, axis=-1)
        init = jnp.broadcast_to(init, (B, C_sub))

        # transition: f(embed(from)) . embed(to), [to, from] indexing
        tr_emb = self._embed(
            params, "transition_embeddings", vcs, self.structure_uses_z, z
        )
        f_emb = _linear(params["transition_weights"], tr_emb)
        x = jnp.einsum("bfe,bte->btf", f_emb, tr_emb)  # (B|1, to, from)
        if self.trans_dis is not None:
            x = jnp.where(jnp.asarray(self.trans_dis)[vcs][:, vcs][None], BIG_NEG, x)
        if self.per_class_bias:
            x = x + params["transition_bias"][vcs][None, :, None]
        if not self.allow_self_transitions:
            x = jnp.where(jnp.eye(C_sub, dtype=bool)[None], BIG_NEG, x)
        x = jnp.where(pad[None, :, None], BIG_NEG, x)
        trans = jax.nn.log_softmax(x, axis=-2)
        trans = jnp.broadcast_to(trans, (B, C_sub, C_sub))

        # lengths: MLP(embed(class, merged)) -> log rates
        len_emb = self._embed(
            params, "length_embeddings", mvc, self.structure_uses_z, z
        )
        log_rates = _residual_mlp(params["length_mlp"], len_emb)[..., 0]
        if self.per_class_bias:
            log_rates = log_rates + params["length_bias"][vcs][None]
        lens = poisson_length_log_probs(log_rates, self.max_k)  # (B|1, K, C_sub)
        lens = jnp.broadcast_to(lens, (B,) + lens.shape[-2:])

        # emission means: MLP(embed(class, merged) ++ z) + bias
        em_emb = self._embed(params, "emission_embeddings", mvc, True, z)
        means = _residual_mlp(params["emission_mean_mlp"], em_emb)
        means = means + params["emission_mean_bias"][None, None, :]
        cov = jax.lax.stop_gradient(params["gaussian_cov"])
        if means.shape[0] == 1 and B > 1:
            means = jnp.broadcast_to(means, (B,) + means.shape[1:])
        emit = gaussian_emission_log_probs(feats, means, cov) + constraints_add

        from action_segmentation_tpu.ops.hsmm import HsmmPotentials

        pots = HsmmPotentials(
            trans=trans, init=init, lens=lens, emit=emit, end_mask=end_allowed
        )
        return pots, log_det, kl
