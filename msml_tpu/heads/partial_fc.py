"""PartialFC: model-parallel (optionally sampled) margin-softmax classifier.

Parity target: `headers/partial_fc.py:11-177` (DeepGlint Partial FC,
arXiv:2010.05222), promoted to a first-class head as the reference left it
half-disabled (`train.py:140-147,282-318`).

TPU-native design
-----------------
The class dimension of the softmax weight W (C, d) is sharded over the same
mesh axis that shards the batch — exactly the reference's rank layout
(`partial_fc.py:34-36`). The whole forward+loss runs inside one
`jax.shard_map`'d train step; the reference's explicit NCCL choreography maps
to XLA ICI collectives:

  reference (NCCL)                          here (ICI)
  ----------------------------------------  ---------------------------------
  all_gather(features/labels)   (110,126)   lax.all_gather(axis, tiled=True)
  all_reduce MAX of logits      (136)       lax.pmax
  all_reduce SUM of exp-sums    (141)       lax.psum
  all_reduce SUM of loss        (162)       lax.psum
  reduce_scatter of feat grads  (174)       AD transpose of all_gather
                                            (= psum_scatter), automatic

Unlike the reference there is no manual forward/backward
(`partial_fc.py:118-177`): the loss below is an ordinary differentiable
function whose analytic gradient *equals* the reference's hand-written one —
smoothed-CE gradient (p - t)/B wrt logits, with the reference's label-smoothing
quirk reproduced: the epsilon mass is confined to the *owner shard's* class
range with denominator (num_sampled_local - 1) (`partial_fc.py:151-156`),
not spread over all C classes.

Sharding details that differ from the reference (documented deviations):
  * Equal shards: C is padded to world_size * num_local; padded class columns
    are masked to -1e30 before the softmax stats (the reference instead gives
    low ranks one extra class).
  * Sampling (`partial_fc.py:77-94`): same positive-preserving top-k-of-random
    scheme, static num_sample = int(sample_rate * num_local) per shard; the
    returned `sample_index` lets the optimizer update momentum only for
    sampled rows, matching the reference's momentum-buffer swap
    (`partial_fc.py:112-114`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from msml_tpu.heads.margin import l2_normalize


def pad_classes(num_classes: int, world_size: int) -> int:
    """Padded per-shard class count (ceil division)."""
    return -(-num_classes // world_size)


def init_pfc_weight(key: jax.Array, num_classes: int, world_size: int,
                    embedding_size: int) -> jnp.ndarray:
    """W ~ Normal(0, 0.01), shape (world*num_local_pad, d)
    (`partial_fc.py:56`). Shard the leading dim over the data axis."""
    num_local = pad_classes(num_classes, world_size)
    return 0.01 * jax.random.normal(
        key, (world_size * num_local, embedding_size), jnp.float32)


@dataclasses.dataclass(frozen=True)
class PartialFC:
    """Static configuration for the sharded softmax head."""

    num_classes: int
    embedding_size: int = 512
    sample_rate: float = 1.0
    margin_fn: Optional[Callable] = None      # (cosine, label) -> logits
    label_smoothing: float = 0.1              # `partial_fc.py:154`
    normalize_features: bool = True
    axis_name: str = "data"
    # Multi-slice (DCN) topology: the class shard lives on `axis_name`
    # (intra-slice, ICI) and is REPLICATED across `slice_axis`. Feature
    # gathering and softmax stats stay per-slice (each slice runs the CE
    # over its own batch rows); only sampling must see the POD-wide labels
    # (a positive anywhere in the global batch must be in the subset, and
    # the subset must be identical on every slice replica of the shard so
    # the replicated weight stays consistent after the cross-slice grad
    # reduction). See core/mesh.py.
    slice_axis: Optional[str] = None

    def num_local(self, world_size: int) -> int:
        return pad_classes(self.num_classes, world_size)

    def num_sample(self, world_size: int) -> int:
        if int(self.sample_rate) == 1:
            return self.num_local(world_size)
        return int(self.sample_rate * self.num_local(world_size))

    # ---------------------------------------------------------------- sample
    def _select_indices(self, sel_label: jnp.ndarray, rng: jax.Array,
                        num_local: int, world_size: int) -> jnp.ndarray:
        """Class-subset selection of `sample()` — weight-free, so it can
        run OUTSIDE the autodiff closure (depends only on labels and rng).
        `sel_label` holds every in-shard positive that must be kept (on a
        multi-slice mesh: from the pod-wide batch). Returns the sorted
        unique index."""
        num_sample = self.num_sample(world_size)
        perm = jax.random.uniform(rng, (num_local,))
        valid = sel_label >= 0
        pos = jnp.where(valid, sel_label, 0)
        # force positives into the top-k (reference sets perm[positive] = 2.0);
        # max-scatter so invalid rows (mapped to index 0) can't stomp a
        # positive's boost
        perm = perm.at[pos].max(jnp.where(valid, 2.0, -jnp.inf))
        _, index = lax.top_k(perm, num_sample)
        return jnp.sort(index)

    def _remap_labels(self, index: jnp.ndarray,
                      local_label: jnp.ndarray) -> jnp.ndarray:
        """Map shard-local labels to positions within the sampled `index`
        (`partial_fc.py:92` torch.searchsorted); labels not in the subset
        map to -1."""
        num_sample = index.shape[0]
        valid = local_label >= 0
        remapped = jnp.searchsorted(index, jnp.where(valid, local_label, 0))
        remapped = jnp.clip(remapped, 0, num_sample - 1)
        # Static-shape deviation from `partial_fc.py:89-90`: when distinct
        # positives exceed num_sample the reference dynamically keeps all of
        # them; with fixed shapes the overflow rows are dropped (-1) instead.
        # Unreachable in practice: num_sample ~ sample_rate*num_local >> batch.
        hit = index[remapped] == jnp.where(valid, local_label, -2)
        return jnp.where(valid & hit, remapped, -1)

    def _sample_indices(self, local_label: jnp.ndarray, rng: jax.Array,
                        num_local: int, world_size: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Selection + remap from the same label vector (single-slice)."""
        index = self._select_indices(local_label, rng, num_local, world_size)
        return index, self._remap_labels(index, local_label)

    def sample(self, weight: jnp.ndarray, local_label: jnp.ndarray,
               rng: jax.Array, world_size: int,
               sel_label: Optional[jnp.ndarray] = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Positive-preserving negative-class sampling
        (`partial_fc.py:77-94`).

        Returns (sub_weight, remapped_label, index). `index` is the sorted
        per-shard class subset; labels outside it map to -1. `sel_label`
        (multi-slice: the pod-wide labels) overrides which positives the
        subset must keep; row remapping always uses `local_label`.
        """
        num_local = weight.shape[0]
        if self.num_sample(world_size) >= num_local:
            return weight, local_label, jnp.arange(num_local)
        sel = local_label if sel_label is None else sel_label
        index = self._select_indices(sel, rng, num_local, world_size)
        remapped = self._remap_labels(index, local_label)
        sub_weight = weight.at[index].get(
            unique_indices=True, indices_are_sorted=True,
            mode="promise_in_bounds")
        return sub_weight, remapped, index

    def _map_to_shard(self, total_label: jnp.ndarray, num_local: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Map already-gathered global labels into this shard's class
        range (outside -> -1). Returns (local_label, class_start)."""
        class_start = lax.axis_index(self.axis_name) * num_local
        in_shard = (total_label >= class_start) & (
            total_label < class_start + num_local)
        return jnp.where(in_shard, total_label - class_start, -1), class_start

    def _shard_labels(self, label: jnp.ndarray, num_local: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """all_gather the (slice-local) global labels and map them into
        this shard's class range. Returns (local_label, class_start)."""
        total_label = lax.all_gather(label, self.axis_name, tiled=True)
        return self._map_to_shard(total_label, num_local)

    def _gather_labels(self, label: jnp.ndarray, num_local: int
                       ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """One data-axis gather for the CE row labels, plus (multi-slice
        only) the POD-wide labels the subset selection must keep —
        identical on every slice replica of this class shard. Returns
        (row_label, sel_label_or_None)."""
        total = lax.all_gather(label, self.axis_name, tiled=True)
        row_label, _ = self._map_to_shard(total, num_local)
        if self.slice_axis is None:
            return row_label, None
        pod = lax.all_gather(total, self.slice_axis, tiled=True)
        # Type-level invariance: the pod-wide label vector is identical on
        # every slice by construction, but all_gather output stays
        # 'varying'-typed in shard_map's vma system — which would taint the
        # whole subset-selection -> sampled-weight-update chain as
        # slice-varying and fail the out_spec P("data") replication check.
        # One pmax over the slice axis (identity on identical values, a few
        # tens of KB over DCN once per step) makes the invariance PROVABLE,
        # so check_vma stays on for the multislice step.
        pod = lax.pmax(pod, self.slice_axis)
        sel_label, _ = self._map_to_shard(pod, num_local)
        return row_label, sel_label

    def presample(self, label: jnp.ndarray, rng: jax.Array
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Compute (sample_index, local_label) for this shard OUTSIDE the
        differentiated loss. Folds rng exactly like `loss()` does, so the
        selected subset is identical; the caller gathers
        `rows = weight[sample_index]` and differentiates `loss_rows` wrt
        the rows — AD then produces the (num_sample, d) row gradient
        directly instead of scatter-adding into a dense (num_local, d)
        zero tensor (measured 5% of the ir100_pfc step, PERF.md r3).
        Must run inside shard_map over `axis_name`."""
        axis = self.axis_name
        world = lax.axis_size(axis)
        num_local = self.num_local(world)
        local_label, sel_label = self._gather_labels(label, num_local)
        if sel_label is None:
            sel_label = local_label
        # fold by the DATA index only: slice replicas of a shard must
        # select the identical subset
        rng = jax.random.fold_in(rng, lax.axis_index(axis))
        index = self._select_indices(sel_label, rng, num_local, world)
        return index, self._remap_labels(index, local_label)

    # ------------------------------------------------------------------ loss
    def loss(self, weight: jnp.ndarray, features: jnp.ndarray,
             label: jnp.ndarray, rng: Optional[jax.Array] = None):
        """Global smoothed-CE over the class-sharded softmax.

        Must run inside shard_map over `axis_name`.
          weight   : (num_local_pad, d) local class shard
          features : (B_local, d) local embeddings
          label    : (B_local,) global class ids
        Returns (loss, aux) with aux = dict(nll=reference-style unsmoothed
        loss value (`partial_fc.py:160-163`), sample_index=(num_sample,) or
        None).
        """
        axis = self.axis_name
        world = lax.axis_size(axis)
        my = lax.axis_index(axis)
        num_local = weight.shape[0]
        class_start = my * num_local

        local_label, sel_label = self._gather_labels(label, num_local)

        sample_index = None
        if int(self.sample_rate) != 1:
            if rng is None:
                raise ValueError("sampled PartialFC needs an rng")
            rng = jax.random.fold_in(rng, my)
            weight, local_label, sample_index = self.sample(
                weight, local_label, rng, world, sel_label)
        return self._ce(weight, features, local_label, sample_index,
                        class_start)

    def loss_rows(self, rows: jnp.ndarray, features: jnp.ndarray,
                  local_label: jnp.ndarray, sample_index: jnp.ndarray):
        """`loss()` for the pre-gathered sampled rows (see `presample`):
        rows == weight[sample_index], (local_label, sample_index) from
        `presample`. Differentiating wrt `rows` yields exactly
        dense_grad[sample_index]; loss value identical to `loss()` with
        the same rng. Must run inside shard_map over `axis_name`."""
        axis = self.axis_name
        world = lax.axis_size(axis)
        class_start = lax.axis_index(axis) * self.num_local(world)
        return self._ce(rows, features, local_label, sample_index,
                        class_start)

    def _ce(self, weight: jnp.ndarray, features: jnp.ndarray,
            local_label: jnp.ndarray, sample_index, class_start):
        """Shared smoothed-CE core over this shard's (possibly sampled)
        class columns `weight`."""
        axis = self.axis_name
        total_features = lax.all_gather(features.astype(jnp.float32),
                                        axis, tiled=True)          # (B, d)
        batch = total_features.shape[0]
        num_cols = weight.shape[0]

        if self.normalize_features:
            total_features = l2_normalize(total_features)
        norm_w = l2_normalize(weight.astype(jnp.float32))
        logits = jnp.dot(total_features, norm_w.T,
                         preferred_element_type=jnp.float32)       # (B, cols)

        if self.margin_fn is not None:
            logits = self.margin_fn(logits, local_label)

        # mask padded (non-existent) classes out of the softmax
        col_class = class_start + (sample_index if sample_index is not None
                                   else jnp.arange(num_cols))
        col_valid = col_class < self.num_classes                   # (cols,)
        logits = jnp.where(col_valid[None, :], logits, -1e30)

        # globally stable log-sum-exp (`partial_fc.py:134-141`)
        max_local = lax.stop_gradient(logits.max(axis=1))
        max_g = lax.pmax(max_local, axis)                           # (B,)
        sumexp = jnp.exp(logits - max_g[:, None]).sum(axis=1)
        sumexp_g = lax.psum(sumexp, axis)
        log_z = jnp.log(sumexp_g) + max_g                           # (B,)

        # smoothed target confined to the owner shard
        # (`partial_fc.py:147-156`): (1-eps) at the target column,
        # eps/(cols_valid-1) on the owner shard's other valid columns.
        eps = self.label_smoothing
        row_valid = local_label >= 0
        safe = jnp.where(row_valid, local_label, 0)
        one_hot = jax.nn.one_hot(safe, num_cols, dtype=jnp.float32)
        one_hot = one_hot * row_valid[:, None]
        n_valid_cols = col_valid.sum().astype(jnp.float32)
        off_mass = eps / jnp.maximum(n_valid_cols - 1.0, 1.0)
        t = (1.0 - eps) * one_hot + off_mass * (
            row_valid[:, None] & col_valid[None, :] & (one_hot == 0.0))

        local_dot = (t * logits).sum(axis=1)                        # (B,)
        global_dot = lax.psum(local_dot, axis)
        # total smoothed target mass per row is 1 -> CE = logZ - <t, z>
        loss = (log_z - global_dot).mean()

        # reference-style reported loss: -log p_target, no smoothing
        # (`partial_fc.py:159-163`)
        tgt_logit = (one_hot * logits).sum(axis=1)
        p_tgt = jnp.exp(tgt_logit - log_z) * row_valid
        p_tgt = lax.psum(p_tgt, axis)
        nll = -jnp.log(jnp.maximum(p_tgt, 1e-30)).mean()

        aux = {"nll": lax.stop_gradient(nll), "sample_index": sample_index,
               "batch": batch}
        return loss, aux


def partial_fc_loss(weight, features, label, *, num_classes,
                    margin_fn=None, sample_rate=1.0, label_smoothing=0.1,
                    normalize_features=True, axis_name="data", rng=None):
    """Functional convenience wrapper around PartialFC.loss."""
    pfc = PartialFC(num_classes=num_classes, embedding_size=features.shape[-1],
                    sample_rate=sample_rate, margin_fn=margin_fn,
                    label_smoothing=label_smoothing,
                    normalize_features=normalize_features, axis_name=axis_name)
    return pfc.loss(weight, features, label, rng)
