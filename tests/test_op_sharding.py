"""Batch-local SPMD execution of the fused Pallas ops.

A pallas_call is opaque to the SPMD partitioner: without the
custom-partitioning rules in ``gavit_tpu/parallel/op_sharding.py`` a jit
over the data mesh all-gathers the batch-sharded operands and every device
computes the FULL global batch (this was measured: 10 all-gather ops in the
tiny-ViT forward HLO before the fix). These tests pin (a) zero batch
all-gathers in the compiled HLO, (b) exact numerical equality with the
single-device path, and (c) the seed-offset / psum plumbing the dropout and
MLP kernels need.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gavit_tpu.config import MeshConfig
from gavit_tpu.parallel.mesh import make_mesh
from gavit_tpu.parallel.op_sharding import batch_partitioned


def _mesh8():
    return make_mesh(MeshConfig(data=8, model=1))


def _batch_allgathers(hlo: str) -> list[str]:
    # all-gathers whose result includes the global batch dimension
    return [l for l in hlo.splitlines() if "all-gather" in l and "= " in l]


def test_v4_attention_sharded_matches_and_no_gather():
    from gavit_tpu.ops.attention import _run_fwd_v4

    b, n, h, d = 16, 6, 2, 8
    qkv3 = jax.random.normal(jax.random.key(0), (b, n, 3 * h * d),
                             jnp.float32)
    ref = np.asarray(_run_fwd_v4(qkv3, 0.5, h, d))

    mesh = _mesh8()
    xs = jax.device_put(qkv3, NamedSharding(mesh, P("data")))
    fn = jax.jit(lambda x: _run_fwd_v4(x, 0.5, h, d))
    out = fn(xs)
    assert "data" in str(out.sharding.spec)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
    hlo = fn.lower(xs).compile().as_text()
    assert not _batch_allgathers(hlo), "pallas op was replicated by GSPMD"


def test_model_forward_hlo_has_no_batch_allgather():
    """End-to-end: the full pallas-impl model forward under the dp mesh
    compiles with zero all-gathers (the pre-fix HLO had 10)."""
    from gavit_tpu.config import from_dict
    from gavit_tpu.models.vit import build_model, init_params

    cfg = from_dict({"model": {
        "name": "custom", "img_size": 16, "patch_size": 8, "embed_dim": 32,
        "depth": 1, "num_heads": 2, "num_classes": 14, "drop_rate": 0.0,
        "graph": {"enabled": True, "num_blocks": 1, "adjacency": "knn",
                  "k": 2},
    }})
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    mesh = _mesh8()
    x = jax.device_put(
        jax.random.normal(jax.random.key(1), (16, 16, 16, 3)),
        NamedSharding(mesh, P("data")),
    )
    params = jax.device_put(params, NamedSharding(mesh, P()))
    fn = jax.jit(
        lambda p, x: model.apply({"params": p}, x, deterministic=True)
    )
    ref = np.asarray(fn(jax.device_get(params), jax.device_get(x)))
    out = fn(params, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
    hlo = fn.lower(params, x).compile().as_text()
    assert not _batch_allgathers(hlo)


def test_flash_v5_sharded_gradients_match():
    from gavit_tpu.ops.attention import flash_attention_large

    b, h, n, d = 8, 2, 40, 8
    q, k, v = (
        jax.random.normal(jax.random.key(i), (b, h, n, d), jnp.float32)
        for i in range(3)
    )

    def loss(q, k, v):
        return jnp.sum(flash_attention_large(q, k, v, 0.3) ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    mesh = _mesh8()
    sh = NamedSharding(mesh, P("data"))
    g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh)
    )
    for a, b_ in zip(g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)


def test_graph_kernel_sharded_matches():
    from gavit_tpu.ops.graph_ops import fused_graph_aggregate

    b, n, d = 16, 12, 16
    tokens = jax.random.normal(jax.random.key(0), (b, n, d), jnp.float32)
    values = jax.random.normal(jax.random.key(1), (b, n, d), jnp.float32)
    ref = np.asarray(fused_graph_aggregate(tokens, values, "knn", 3))

    mesh = _mesh8()
    sh = NamedSharding(mesh, P("data"))
    out = jax.jit(
        lambda t, v: fused_graph_aggregate(t, v, "knn", 3)
    )(jax.device_put(tokens, sh), jax.device_put(values, sh))
    assert "data" in str(out.sharding.spec)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_seed_offset_and_psum_plumbing():
    """A stand-in 'kernel' (pure XLA so it runs on CPU) exercises the
    seed-offset and psum wrapper features the PRNG kernels rely on."""

    def impl(x, seed):
        # per-call 'mask' stream stands in for the hardware PRNG: the output
        # encodes the seed so shard-local seeds are observable
        y = x + seed[0].astype(x.dtype)
        col = jnp.sum(x, axis=0, keepdims=True)  # reduction over batch rows
        return y, col

    wrapped = batch_partitioned(
        impl, (0, None), (0, None),
        seed_arg=1, seed_stride=lambda args: args[0].shape[0],
        psum_outs=(1,),
    )

    x = jnp.arange(32.0, dtype=jnp.float32).reshape(16, 2)
    seed = jnp.asarray([7], jnp.int32)

    # single device: offset 0, plain behavior
    y, col = jax.jit(wrapped)(x, seed)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) + 7.0)
    np.testing.assert_allclose(np.asarray(col), np.asarray(x).sum(0)[None])

    mesh = _mesh8()
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ss = jax.device_put(seed, NamedSharding(mesh, P()))
    y8, col8 = jax.jit(wrapped)(xs, ss)
    # psum'd reduction equals the global reduction
    np.testing.assert_allclose(np.asarray(col8), np.asarray(x).sum(0)[None])
    # each shard of 2 rows saw seed 7 + shard_index*2
    y8 = np.asarray(y8)
    expect = np.asarray(x) + 7.0
    for shard in range(8):
        expect[2 * shard: 2 * shard + 2] += 2 * shard
    np.testing.assert_allclose(y8, expect)


@pytest.mark.parametrize("rate,out_rate", [(0.1, 0.0), (0.1, 0.1)])
def test_fused_mlp_cpu_path_unchanged_by_wrappers(rate, out_rate):
    """Off-TPU the public ops still use the unwrapped XLA fallback — CPU
    numerics (and the tests built on them) are unaffected."""
    from gavit_tpu.ops.mlp import fused_mlp

    m, d, f = 12, 8, 16
    x = jax.random.normal(jax.random.key(0), (m, d), jnp.float32)
    w1 = jax.random.normal(jax.random.key(1), (d, f), jnp.float32) * 0.1
    b1 = jnp.zeros((f,))
    w2 = jax.random.normal(jax.random.key(2), (f, d), jnp.float32) * 0.1
    b2 = jnp.zeros((d,))
    s = jnp.asarray([3], jnp.int32)
    y = fused_mlp(x, w1, b1, w2, b2, s, rate, out_rate)
    y2 = fused_mlp(x, w1, b1, w2, b2, s, rate, out_rate)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_elementwise_partitioned_plumbing():
    """elementwise_partitioned lets EVERY dim stay sharded (TP's feature-
    sharded hidden, SP's token-sharded stream), with the per-shard seed
    offset linearised over all sharded axes — and no all-gather in the
    HLO for a 2-D (data × model) sharding."""
    from gavit_tpu.parallel.op_sharding import elementwise_partitioned

    def impl(x, seed):
        return x + seed[0].astype(x.dtype)

    wrapped = elementwise_partitioned(
        impl, seed_arg=1, seed_stride=lambda args: args[0].shape[0],
    )

    x = jnp.zeros((8, 4), jnp.float32)
    seed = jnp.asarray([7], jnp.int32)

    # single device: offset 0
    np.testing.assert_allclose(np.asarray(jax.jit(wrapped)(x, seed)), 7.0)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    # batch AND feature sharded: linear index = data_idx*2 + model_idx,
    # stride = local rows (2)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
    fn = jax.jit(wrapped)
    y = np.asarray(fn(xs, seed))
    hlo = fn.lower(xs, seed).compile().as_text()
    assert "all-gather" not in hlo
    for di in range(4):
        for mi in range(2):
            block = y[2 * di: 2 * di + 2, 2 * mi: 2 * mi + 2]
            np.testing.assert_allclose(block, 7.0 + (di * 2 + mi) * 2)

    # feature-only sharding (the Megatron-TP hidden layout)
    xf = jax.device_put(x, NamedSharding(mesh, P(None, "model")))
    yf = np.asarray(jax.jit(wrapped)(xf, seed))
    for mi in range(2):
        np.testing.assert_allclose(
            yf[:, 2 * mi: 2 * mi + 2], 7.0 + mi * 8
        )


def _patch_mlp_kernels(monkeypatch):
    """Route the fused-MLP public op through its custom-partitioning
    wrappers on CPU: _on_tpu → True, Pallas runners → the XLA fallbacks
    (same contracts; real kernel bodies are covered in
    test_mlp_fused.py / on hardware by bench.py's selfcheck)."""
    import gavit_tpu.ops.mlp as mmod

    monkeypatch.setattr(mmod, "_on_tpu", lambda: True)
    monkeypatch.setattr(
        mmod, "_run_fwd",
        lambda x2, w1, b1, w2, b2, seed, rate, out_rate, bm, add_bias2=True:
            mmod._fallback_fwd(x2, w1, b1, w2, b2, seed, rate, out_rate,
                               add_bias2),
    )
    monkeypatch.setattr(
        mmod, "_run_bwd",
        lambda dy2, h1, w2, seed, rate, out_rate, bm:
            mmod._fallback_bwd(dy2, h1, w2, seed, rate, out_rate),
    )
    mmod._mlp_fwd_cp.cache_clear()
    mmod._mlp_bwd_cp.cache_clear()
    return mmod


def test_fused_mlp_megatron_tp_matches_and_no_weight_allgather(monkeypatch):
    """The megakernel under Megatron TP (VERDICT r3 #2): w1/b1 column-
    sharded and w2 row-sharded on the 'f' factor, y psum'd over 'model',
    bias2 added post-reduce — values AND grads equal the single-device op,
    with zero all-gathers in the HLO (the old batch-only rule re-gathered
    the Megatron weights per call)."""
    mmod = _patch_mlp_kernels(monkeypatch)

    m, d, f = 16, 8, 32
    x = jax.random.normal(jax.random.key(0), (2, m // 2, d), jnp.float32)
    w1 = jax.random.normal(jax.random.key(1), (d, f), jnp.float32) * 0.3
    b1 = jax.random.normal(jax.random.key(2), (f,), jnp.float32) * 0.1
    w2 = jax.random.normal(jax.random.key(3), (f, d), jnp.float32) * 0.3
    b2 = jax.random.normal(jax.random.key(4), (d,), jnp.float32) * 0.1
    seed = jnp.asarray([5], jnp.int32)

    def loss(x, w1, b1, w2, b2):
        # the Mlp module's TP call shape: no bias2 in-kernel, added after
        y = mmod.fused_mlp(x, w1, b1, w2, jnp.zeros_like(b2), seed,
                           0.0, 0.0, False) + b2
        return jnp.sum(y ** 2)

    ref = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)

    mesh = make_mesh(MeshConfig(data=2, model=2))
    put = lambda a, s: jax.device_put(a, NamedSharding(mesh, s))
    args = (put(x, P("data")), put(w1, P(None, "model")),
            put(b1, P("model")), put(w2, P("model", None)), put(b2, P()))
    fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
    with jax.set_mesh(mesh):
        val, grads = fn(*args)
        hlo = fn.lower(*args).compile().as_text()
    np.testing.assert_allclose(float(val), float(loss(x, w1, b1, w2, b2)),
                               rtol=1e-6)
    for g, r in zip(grads, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)
    assert "all-gather" not in hlo, "Megatron weights were re-gathered"
    mmod._mlp_fwd_cp.cache_clear()
    mmod._mlp_bwd_cp.cache_clear()


def test_fused_mlp_tp_dropout_masks_regenerate(monkeypatch):
    """With hidden dropout active under dp×tp, the backward must regenerate
    the forward's masks (same per-shard seed offsets from the same specs):
    dx's zero pattern matches the forward's dropped hidden units, and
    distinct shards draw distinct streams."""
    mmod = _patch_mlp_kernels(monkeypatch)

    # d == f with identity weights makes the hidden masks OBSERVABLE:
    # y[m, u] == 0 iff the forward dropped unit u, and dx[m, u] == 0 iff
    # the regenerated backward mask dropped it (gelu(1.5) and its grad are
    # both positive for kept units)
    m = 8
    d = f = 16
    x = jnp.ones((2, m // 2, d), jnp.float32)
    w1 = jnp.eye(d, dtype=jnp.float32)
    b1 = jnp.full((f,), 0.5, jnp.float32)
    w2 = jnp.eye(f, dtype=jnp.float32)
    b2 = jnp.zeros((d,), jnp.float32)
    seed = jnp.asarray([9], jnp.int32)
    rate = 0.5

    mesh = make_mesh(MeshConfig(data=2, model=2))
    put = lambda a, s: jax.device_put(a, NamedSharding(mesh, s))
    w1s = put(w1, P(None, "model"))
    b1s, w2s = put(b1, P("model")), put(w2, P("model", None))

    def f_out(x):
        return mmod.fused_mlp(put(x, P("data")), w1s, b1s, w2s,
                              jnp.zeros_like(b2), seed, rate, 0.0, False)

    with jax.set_mesh(mesh):
        y = np.asarray(jax.jit(f_out)(x))
        dx = np.asarray(jax.jit(jax.grad(
            lambda x: jnp.sum(f_out(x))))(x))
    kept = y != 0.0
    assert 0.1 < kept.mean() < 0.9
    np.testing.assert_array_equal(dx != 0.0, kept)
    # the two f-shard halves and the two data shards draw distinct streams
    assert not np.array_equal(kept[..., : f // 2], kept[..., f // 2:])
    assert not np.array_equal(kept[0], kept[1])
    mmod._mlp_fwd_cp.cache_clear()
    mmod._mlp_bwd_cp.cache_clear()


def test_gelu_dropout_feature_sharded_no_allgather():
    """The TP MLP chain's mid-site: fused_gelu_dropout on a [B, N, F]
    hidden sharded ('data', None, 'model') must run shard-locally — the
    old batch-only rule all-gathered the F dim around the kernel every
    block. CPU short-circuits to the XLA fallback (also elementwise, also
    no gather), so this pins the fallback path's HLO; the kernel path's
    rule is pinned by the stand-in test above and the interpret-mode
    sharded-mask test in test_kernels_interpret.py."""
    from gavit_tpu.ops.dropout import fused_gelu_dropout

    mesh = make_mesh(MeshConfig(data=4, model=2))
    x = jax.random.normal(jax.random.key(0), (8, 16, 64), jnp.float32)
    seed = jnp.asarray([3], jnp.int32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, "model")))

    def f(x, seed):
        return jnp.sum(fused_gelu_dropout(x, seed, 0.1))

    fn = jax.jit(jax.grad(f))
    g = fn(xs, seed)
    hlo = fn.lower(xs, seed).compile().as_text()
    assert "all-gather" not in hlo
    assert np.isfinite(np.asarray(g)).all()


def test_gelu_dropout_sharded_masks_regenerate_in_backward(monkeypatch):
    """The elementwise rule's at-risk property: the forward and backward
    wrappers are SEPARATE custom-partitioning calls that must derive the
    same per-shard seed offsets (same spec, same local shapes) so the
    backward regenerates the forward's masks. Interpret-mode pallas cannot
    lower inside a partition body (ordered-IO callback effect), so the
    kernel runners are swapped for pure-XLA stand-ins with the kernels'
    seed→mask semantics (deterministic in (seed, local shape)); the kernel
    BODIES are covered single-device in test_kernels_interpret.py."""
    import gavit_tpu.ops.dropout as dmod
    from gavit_tpu.ops.dropout import _gelu_f32, _gelu_grad_f32

    rate = 0.4

    def _mask(seed, shape):
        return jax.random.bernoulli(
            jax.random.PRNGKey(seed[0].astype(jnp.uint32)), 1.0 - rate, shape
        )

    def standin_fwd(x, seed, _rate):
        y = _gelu_f32(x.astype(jnp.float32)) / (1.0 - rate)
        return jnp.where(_mask(seed, x.shape), y, 0.0).astype(x.dtype)

    def standin_bwd(x, g, seed, _rate):
        dx = (_gelu_grad_f32(x.astype(jnp.float32))
              * g.astype(jnp.float32) / (1.0 - rate))
        return jnp.where(_mask(seed, x.shape), dx, 0.0).astype(x.dtype)

    monkeypatch.setattr(dmod, "_on_tpu", lambda: True)
    monkeypatch.setattr(dmod, "_run_gelu_dropout_kernel", standin_fwd)
    monkeypatch.setattr(dmod, "_run_gelu_dropout_bwd_kernel", standin_bwd)
    dmod._gd_cp.cache_clear()
    dmod._gd_bwd_cp.cache_clear()

    mesh = make_mesh(MeshConfig(data=4, model=2))
    x = jnp.ones((8, 16, 64), jnp.float32)
    seed = jnp.asarray([11], jnp.int32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, "model")))

    y = np.asarray(jax.jit(
        lambda x: dmod.fused_gelu_dropout(x, seed, rate))(xs))
    g = np.asarray(jax.jit(jax.grad(
        lambda x: jnp.sum(dmod.fused_gelu_dropout(x, seed, rate))))(xs))
    kept = y != 0.0
    assert 0.3 < kept.mean() < 0.9
    np.testing.assert_array_equal(g != 0.0, kept)
    # shards draw distinct streams: the two feature halves differ, and so
    # do the data shards
    assert not np.array_equal(kept[..., :32], kept[..., 32:])
    assert not np.array_equal(kept[:2], kept[2:4])
    dmod._gd_cp.cache_clear()
    dmod._gd_bwd_cp.cache_clear()
