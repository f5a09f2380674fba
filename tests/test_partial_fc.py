"""PartialFC on an 8-device CPU mesh vs a dense single-device oracle.

The oracle builds the full (B, C_pad) logits and the exact smoothed target
the reference constructs per-rank (`headers/partial_fc.py:147-167`): (1-eps)
at the target column plus eps/(num_local-1) spread over the *owner shard's*
other columns only — then checks that the sharded loss and its gradients
(features via the all_gather transpose == the reference's reduce_scatter at
partial_fc.py:174, and the class-sharded weight) match.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from msml_tpu.heads.margin import amarc_margin, l2_normalize
from msml_tpu.heads.partial_fc import PartialFC, init_pfc_weight

WORLD = 8
NUM_CLASSES = 61          # deliberately not divisible by 8 (padding path)
DIM = 16
BATCH = 24                # 3 rows per shard


def _mesh():
    return Mesh(np.array(jax.devices()[:WORLD]), ("data",))


def _data(seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(BATCH, DIM).astype(np.float32)
    labels = rng.randint(0, NUM_CLASSES, size=(BATCH,)).astype(np.int32)
    w = (0.01 * rng.randn(WORLD * _num_local(), DIM)).astype(np.float32)
    return feats, labels, w


def _num_local():
    return -(-NUM_CLASSES // WORLD)


def _dense_oracle(w, feats, labels, eps=0.1, margin=None):
    """Single-device dense computation with the owner-shard smoothing quirk."""
    num_local = _num_local()
    c_pad = WORLD * num_local
    f = l2_normalize(jnp.asarray(feats))
    wn = l2_normalize(jnp.asarray(w))
    logits = f @ wn.T  # (B, C_pad)
    if margin is not None:
        logits = margin(logits, jnp.asarray(labels))
    col_valid = jnp.arange(c_pad) < NUM_CLASSES
    logits = jnp.where(col_valid[None, :], logits, -1e30)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # owner-shard-confined smoothed target
    owner = labels // num_local
    col_shard = jnp.arange(c_pad) // num_local
    in_owner = (col_shard[None, :] == owner[:, None]) & col_valid[None, :]
    one_hot = jax.nn.one_hot(labels, c_pad)
    n_valid_owner = jnp.minimum(NUM_CLASSES - owner * num_local, num_local)
    off = eps / jnp.maximum(n_valid_owner - 1, 1)[:, None]
    t = (1 - eps) * one_hot + off * (in_owner & (one_hot == 0))
    return -(t * logp).sum(-1).mean()


def _sharded_loss(pfc, w, feats, labels, rng=None):
    mesh = _mesh()

    def f(w, feats, labels):
        loss, aux = pfc.loss(w, feats, labels,
                             rng if rng is None else jnp.asarray(rng))
        return loss, aux["nll"]

    fn = jax.shard_map(f, mesh=mesh,
                       in_specs=(P("data"), P("data"), P("data")),
                       out_specs=(P(), P()))
    return fn(jnp.asarray(w), jnp.asarray(feats), jnp.asarray(labels))


@pytest.mark.slow
def test_pfc_loss_matches_dense_oracle():
    feats, labels, w = _data()
    pfc = PartialFC(num_classes=NUM_CLASSES, embedding_size=DIM)
    loss, _ = _sharded_loss(pfc, w, feats, labels)
    want = _dense_oracle(w, feats, labels)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)


@pytest.mark.slow
def test_pfc_with_margin_matches_dense():
    feats, labels, w = _data(1)
    num_local = _num_local()
    margin = functools.partial(amarc_margin, s=64.0, m=0.5, a=0.0, k=0.0)

    def dense_margin(logits, labels):
        # apply the same per-shard margin on the dense matrix
        out = []
        for r in range(WORLD):
            sl = logits[:, r * num_local:(r + 1) * num_local]
            local = jnp.where((labels >= r * num_local)
                              & (labels < (r + 1) * num_local),
                              labels - r * num_local, -1)
            out.append(margin(sl, local))
        return jnp.concatenate(out, axis=1)

    pfc = PartialFC(num_classes=NUM_CLASSES, embedding_size=DIM,
                    margin_fn=margin)
    loss, _ = _sharded_loss(pfc, w, feats, labels)
    want = _dense_oracle(w, feats, labels, margin=dense_margin)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)


@pytest.mark.slow
def test_pfc_gradients_match_dense():
    feats, labels, w = _data(2)
    pfc = PartialFC(num_classes=NUM_CLASSES, embedding_size=DIM)
    mesh = _mesh()

    def sharded(w, feats):
        def f(w, feats, labels):
            loss, _ = pfc.loss(w, feats, labels)
            return loss
        fn = jax.shard_map(f, mesh=mesh,
                           in_specs=(P("data"), P("data"), P("data")),
                           out_specs=P())
        return fn(w, feats, jnp.asarray(labels))

    g_w, g_f = jax.grad(sharded, argnums=(0, 1))(jnp.asarray(w),
                                                 jnp.asarray(feats))
    gw_want, gf_want = jax.grad(
        lambda w, f: _dense_oracle(w, f, labels), argnums=(0, 1))(
        jnp.asarray(w), jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(gf_want),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(gw_want),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_pfc_nll_matches_plain_ce():
    """aux['nll'] reports the unsmoothed -log p_y (partial_fc.py:160-163)."""
    feats, labels, w = _data(3)
    pfc = PartialFC(num_classes=NUM_CLASSES, embedding_size=DIM)
    _, nll = _sharded_loss(pfc, w, feats, labels)
    f = l2_normalize(jnp.asarray(feats))
    wn = l2_normalize(jnp.asarray(w))
    logits = f @ wn.T
    logits = jnp.where(jnp.arange(w.shape[0])[None, :] < NUM_CLASSES,
                       logits, -1e30)
    logp = jax.nn.log_softmax(logits, -1)
    want = -jnp.take_along_axis(logp, jnp.asarray(labels)[:, None], 1).mean()
    np.testing.assert_allclose(float(nll), float(want), rtol=1e-5)


@pytest.mark.slow
def test_pfc_sampled_mode():
    """sample_rate < 1: positives always kept (when they fit, which real
    training guarantees: num_sample >> batch), loss finite
    (partial_fc.py:77-94)."""
    feats, _, w = _data(4)
    # at most 2 distinct positive classes per shard < num_sample = 4
    num_local = _num_local()
    labels = np.array([(i % WORLD) * num_local + (i % 2)
                       for i in range(BATCH)], dtype=np.int32)
    labels = np.minimum(labels, NUM_CLASSES - 1)
    pfc = PartialFC(num_classes=NUM_CLASSES, embedding_size=DIM,
                    sample_rate=0.5)
    mesh = _mesh()

    def f(w, feats, labels):
        loss, aux = pfc.loss(w, feats, labels, jax.random.PRNGKey(0))
        return loss, aux["nll"], aux["sample_index"]

    fn = jax.shard_map(f, mesh=mesh,
                       in_specs=(P("data"), P("data"), P("data")),
                       out_specs=(P(), P(), P("data")))
    loss, nll, index = fn(jnp.asarray(w), jnp.asarray(feats),
                          jnp.asarray(labels))
    assert np.isfinite(float(loss)) and np.isfinite(float(nll))
    num_local = _num_local()
    index = np.asarray(index).reshape(WORLD, -1)
    assert index.shape[1] == pfc.num_sample(WORLD)
    # every shard's positive labels must be inside its sampled set
    for r in range(WORLD):
        local = labels[(labels >= r * num_local)
                       & (labels < (r + 1) * num_local)] - r * num_local
        assert set(local.tolist()) <= set(index[r].tolist())


@pytest.mark.slow
def test_pfc_rows_path_matches_in_closure_sampling():
    """presample + loss_rows + pfc_sgd_update_rows (the scatter-free
    train-step path) must reproduce the in-closure sampled path exactly:
    same index, same loss, rows_grad == dense_grad[index], same updated
    weight/momentum."""
    from msml_tpu.train.optim import pfc_sgd_update, pfc_sgd_update_rows

    feats, _, w = _data(4)
    num_local = _num_local()
    labels = np.array([(i % WORLD) * num_local + (i % 2)
                       for i in range(BATCH)], dtype=np.int32)
    labels = np.minimum(labels, NUM_CLASSES - 1).astype(np.int32)
    pfc = PartialFC(num_classes=NUM_CLASSES, embedding_size=DIM,
                    sample_rate=0.5)
    mesh = _mesh()
    rng = jax.random.PRNGKey(7)
    w, feats, labels = jnp.asarray(w), jnp.asarray(feats), jnp.asarray(labels)
    mom = 0.3 * jnp.ones_like(w)
    lr, lrf, wd, mc = jnp.float32(0.1), jnp.float32(1.0), 5e-4, 0.9

    def old(w, feats, labels):
        def inner(wi):
            loss, aux = pfc.loss(wi, feats, labels, rng)
            return loss, aux["sample_index"]
        (loss, index), g = jax.value_and_grad(inner, has_aux=True)(w)
        nw, nm = pfc_sgd_update(w, g, mom, lr, lrf, wd, mc, index)
        return loss, index, g, nw, nm

    def new(w, feats, labels):
        index, local_label = pfc.presample(labels, rng)
        rows = w.at[index].get(unique_indices=True,
                               indices_are_sorted=True,
                               mode="promise_in_bounds")
        def inner(r):
            loss, _ = pfc.loss_rows(r, feats, local_label, index)
            return loss
        loss, rg = jax.value_and_grad(inner)(rows)
        nw, nm = pfc_sgd_update_rows(w, rg, mom, lr, lrf, wd, mc, index)
        return loss, index, rg, nw, nm

    specs = dict(in_specs=(P("data"), P("data"), P("data")),
                 out_specs=(P(), P("data"), P("data"), P("data"), P("data")))
    lo, io, go, wo, mo = jax.shard_map(old, mesh=mesh, **specs)(
        w, feats, labels)
    ln, inn, gn, wn, mn = jax.shard_map(new, mesh=mesh, **specs)(
        w, feats, labels)

    assert float(lo) == float(ln)
    np.testing.assert_array_equal(np.asarray(io), np.asarray(inn))
    # rows grad == dense grad gathered at the sampled rows, per shard
    go = np.asarray(go).reshape(WORLD, num_local, DIM)
    gn = np.asarray(gn).reshape(WORLD, -1, DIM)
    idx = np.asarray(io).reshape(WORLD, -1)
    for r in range(WORLD):
        np.testing.assert_array_equal(go[r][idx[r]], gn[r])
        # unsampled rows got zero dense grad (so the updates can match)
        mask = np.ones(num_local, bool)
        mask[idx[r]] = False
        assert np.all(go[r][mask] == 0.0)
    np.testing.assert_array_equal(np.asarray(wo), np.asarray(wn))
    np.testing.assert_array_equal(np.asarray(mo), np.asarray(mn))


def test_init_pfc_weight_shape():
    w = init_pfc_weight(jax.random.PRNGKey(0), NUM_CLASSES, WORLD, DIM)
    assert w.shape == (WORLD * _num_local(), DIM)
    assert abs(float(w.std()) - 0.01) < 0.002
