"""Core ViT layers (Flax linen), designed TPU-first.

Parity notes vs the PyTorch reference (``/root/reference/src/models/vit.py``):

* Patchify is a reshape + single einsum instead of a Conv2d (``vit.py:22-23``)
  — on TPU a stride-16 conv and a [B,N,p·p·C] @ [p·p·C,D] GEMM are the same
  FLOPs, but the explicit GEMM maps directly onto the MXU with no im2col and
  fuses with the surrounding graph. The patch feature ordering is
  channel-major ``(c, ph, pw)`` so a torch conv weight ``[D, C, kh, kw]``
  converts by ``w.reshape(D, -1).T``.
* GELU is exact (erf) to match ``nn.GELU()`` (``vit.py:84``).
* LayerNorm epsilon is 1e-5 (torch default), not flax's 1e-6.
* DropPath follows the per-sample binary mask with 1/keep rescale
  (``vit.py:227-242``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gavit_tpu.ops.dropout import (
    dropout_seed,
    fused_dropout,
    fused_gelu_dropout,
)
from gavit_tpu.ops.mlp import fused_mlp
from gavit_tpu.ops.quant import (
    fake_quant_act,
    fake_quant_weight,
    int8_matmul,
    static_int8_matmul,
)
from gavit_tpu.ops.attention import (
    attention_reference,
    fused_qkv_attention,
    multi_head_attention,
)
from gavit_tpu.parallel.op_sharding import (
    head_shard_constraint,
    seq_shard_constraint,
)

trunc_init = nn.initializers.truncated_normal(stddev=0.02)
LN_EPS = 1e-5




def mm_precision(dtype):
    """Matmul precision policy: fp32 activations demand HIGHEST (TPU MXUs
    default fp32 matmuls to bf16 passes, which breaks the ≤1e-3 logit-parity
    bar); bf16 training keeps the fast default."""
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


class QDense(nn.Module):
    """Dense with an optional int8 dynamic-quantised path (serving PTQ).

    Param layout is identical to nn.Dense (kernel [K, F], bias [F]) so
    checkpoints and the torch converter are unaffected; ``quant=True`` routes
    the GEMM through the int8 MXU (ops/quant.py)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: bool = False
    kernel_init: object = trunc_init

    @nn.compact
    def __call__(self, x, fuse_bias_grad: bool = False):
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
            if self.use_bias else None
        )
        if self.quant:
            y = self._int8(x, kernel).astype(self.dtype)
            if bias is not None:
                y = y + bias.astype(self.dtype)
            return y
        if bias is not None and fuse_bias_grad:
            # augmented-GEMM formulation: y = [x, 1] @ [[W]; [b]]. The bias
            # gradient then falls out of the dW GEMM (MXU rates) instead of
            # XLA's slow row-reduction of g (−12 ms/step measured at ViT-B
            # b128). Training-only: the extra activation concat would slow
            # forward-only inference.
            ones = jnp.ones(x.shape[:-1] + (1,), self.dtype)
            xa = jnp.concatenate([x.astype(self.dtype), ones], axis=-1)
            wk = jnp.concatenate(
                [kernel, bias[None, :]], axis=0
            ).astype(self.dtype)
            return jnp.dot(xa, wk, precision=mm_precision(self.dtype))
        y = jnp.dot(
            x.astype(self.dtype), kernel.astype(self.dtype),
            precision=mm_precision(self.dtype),
        )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y

    def _int8(self, x, kernel):
        return _int8_forward(self, x, kernel)


def _int8_forward(mod: nn.Module, x, kernel):
    """Static PTQ when a calibrated "quant" collection is supplied
    (pre-quantised weights + per-tensor activation scales — no per-call
    absmax passes); dynamic PTQ otherwise, sowing activation absmax for
    calibration runs (mutable=['quant_stats']).

    ``quant == 'qat'`` (quantisation-aware training) fake-quantises both
    operands — the activation against the calibrated static scale, the
    LIVE weight against its per-column absmax — and runs the GEMM in the
    compute dtype, so training sees exactly the quantisation noise the
    int8 serving path will apply to the exported checkpoint. Gradients
    flow by straight-through estimation (ops/quant.py). Without scales
    yet (the calibration pass), it sows absmax and computes unquantised.
    """
    if mod.quant == "qat":
        if mod.has_variable("quant", "act_scale"):
            act_scale = mod.variable(
                "quant", "act_scale", lambda: None).value
            xq = fake_quant_act(x.astype(mod.dtype), act_scale)
            wq = fake_quant_weight(kernel).astype(mod.dtype)
            return jnp.dot(xq, wq, precision=mm_precision(mod.dtype))
        mod.sow(
            "quant_stats", "act_absmax",
            jnp.max(jnp.abs(x.astype(jnp.float32))),
            reduce_fn=jnp.maximum, init_fn=lambda: jnp.float32(0.0),
        )
        return jnp.dot(
            x.astype(mod.dtype), kernel.astype(mod.dtype),
            precision=mm_precision(mod.dtype),
        )
    if mod.has_variable("quant", "w_q"):
        w_q = mod.variable("quant", "w_q", lambda: None).value
        w_scale = mod.variable("quant", "w_scale", lambda: None).value
        act_scale = mod.variable("quant", "act_scale", lambda: None).value
        return static_int8_matmul(x, w_q, w_scale, act_scale)
    mod.sow(
        "quant_stats", "act_absmax",
        jnp.max(jnp.abs(x.astype(jnp.float32))),
        reduce_fn=jnp.maximum, init_fn=lambda: jnp.float32(0.0),
    )
    return int8_matmul(x, kernel)


class PatchEmbed(nn.Module):
    """Image → patch tokens: [B, H, W, C] → [B, N, D] (NHWC, TPU-native)."""

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        p = self.patch_size
        if h % p or w % p:
            raise ValueError(f"image size {h}x{w} not divisible by patch size {p}")
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, p, gw, p, c)
        # (c, ph, pw) ordering inside each patch vector — matches the
        # flattening of a torch Conv2d weight [D, C, kh, kw]
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, gh * gw, c * p * p)
        x = QDense(
            self.embed_dim,
            dtype=self.dtype,
            quant=self.quant,
            kernel_init=nn.initializers.xavier_uniform(),
            name="proj",
        )(x)
        return x


class _DenseParams(nn.Module):
    """Parameter-only holder matching QDense's tree (kernel [K, F], bias
    [F]) so the fused-MLP path shares checkpoints with the unfused one."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", trunc_init, (self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            jnp.float32,
        )
        return kernel, bias


class Mlp(nn.Module):
    """Dense → GELU(exact) → drop → Dense → drop (``vit.py:75-94``).

    ``impl``: 'auto'/'pallas' use the fused megakernel where it fits;
    'xla' forces the composed chain. Under a >1 'model' mesh axis the
    fused path is skipped automatically at every entry point (its
    partitioning rule would all-gather the Megatron-sharded weights)."""

    hidden_dim: int
    out_dim: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant: bool = False
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from gavit_tpu.ops.mlp import pick_block
        from gavit_tpu.parallel.op_sharding import tp_axis_in_context

        tp = tp_axis_in_context("model")
        if (not self.quant and x.ndim == 3
                and self.impl in ("auto", "pallas")
                # TP inference stays on the XLA chain (GSPMD Megatron); TP
                # TRAINING keeps the megakernel — the 'f' factor rule in
                # ops/mlp.py runs it on each chip's hidden shard with the
                # row-parallel psum after fc2, bias2 + out-dropout applied
                # post-reduce below
                and not (tp and deterministic)
                and pick_block(x.shape[0] * x.shape[1], x.shape[-1],
                               self.hidden_dim,
                               jnp.dtype(self.dtype).itemsize) is not None):
            # fused fast path: the whole fc1→GELU→dropout→fc2 chain in one
            # Pallas pass — the [M, hidden] activations never exist in HBM
            # (ops/mlp.py). Shapes without a clean row block (e.g. 384px's
            # prime token count) keep the round-2 path below (augmented-GEMM
            # fc1/fc2 + fused GELU+dropout kernel), which measured faster
            # than any XLA-composed chain there.
            d = x.shape[-1]
            w1, b1 = _DenseParams(self.hidden_dim, d, name="fc1")()
            w2, b2 = _DenseParams(self.out_dim, self.hidden_dim,
                                  name="fc2")()
            args = (
                x.astype(self.dtype),
                w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype),
            )
            if deterministic:
                # serving twin: same megakernel shape, tanh GELU on bf16
                # (erf for fp32 — but fp32 weights never fit the VMEM
                # budget, so the fp32 parity path takes the XLA chain below)
                from gavit_tpu.ops.mlp import fused_mlp_inference

                return fused_mlp_inference(
                    *args, self.dtype == jnp.bfloat16,
                )
            import os

            seed = dropout_seed(self.make_rng("dropout"))
            if tp:
                # Megatron TP: each chip runs the kernel on its hidden
                # shard (out_rate=0, no bias2 — both must follow the
                # row-parallel psum). GSPMD inserts the psum from the 'f'
                # contraction; bias + the trailing dropout site apply to
                # the reduced output, identically on every model shard.
                y = fused_mlp(*args[:4], jnp.zeros_like(args[4]), seed,
                              self.drop, 0.0, False)
                y = y + args[4]
                return FusedDropout(self.drop)(y, deterministic=deterministic)
            # the reference MLP's trailing dropout site (vit.py:92-93) is
            # folded into the same kernel pass as out_rate
            fold = os.environ.get("GAVIT_MLP_FOLD_OUT", "1") == "1"
            y = fused_mlp(
                *args, seed, self.drop, self.drop if fold else 0.0,
            )
            if not fold:
                y = FusedDropout(self.drop)(y, deterministic=deterministic)
            return y
        x = QDense(self.hidden_dim, dtype=self.dtype, quant=self.quant,
                   name="fc1")(x, fuse_bias_grad=not deterministic)
        if not deterministic and self.drop > 0.0:
            # exact-GELU + dropout in one Pallas pass: the erf computes in
            # the dropout kernel's HBM-bound phase instead of gating the fc1
            # GEMM epilogue, and the backward collapses to one kernel
            # (ops/dropout.py::fused_gelu_dropout).
            seed = dropout_seed(self.make_rng("dropout"))
            x = fused_gelu_dropout(x, seed, self.drop)
        else:
            # exact erf matches nn.GELU() for the fp32 parity bar. In bf16
            # the tanh approximation's max deviation (~3e-4) is below the
            # bf16 rounding step, and it is measured FASTER forward-only
            # (inference 2,502→3,084 img/s at b64) but SLOWER through the
            # backward (train 170.8→182.1 ms/step — the tanh VJP costs more
            # VPU time than erf's exp). So: tanh on the deterministic bf16
            # path, exact erf everywhere gradients flow (BASELINE.md).
            approx = self.dtype == jnp.bfloat16 and deterministic
            x = jax.nn.gelu(x, approximate=approx)
            x = FusedDropout(self.drop)(x, deterministic=deterministic)
        x = QDense(self.out_dim, dtype=self.dtype, quant=self.quant,
                   name="fc2")(x, fuse_bias_grad=not deterministic)
        return FusedDropout(self.drop)(x, deterministic=deterministic)


class FusedDropout(nn.Module):
    """Dropout via the memory-free fused kernel (ops/dropout.py): hardware
    PRNG in-kernel, mask regenerated in backward — replaces XLA's
    uniform→compare→select three-pass pattern (≈16 ms/step at ViT-B b128)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        seed = dropout_seed(self.make_rng("dropout"))
        return fused_dropout(x, seed, self.rate)


def drop_path(x, rate, deterministic: bool, rng) -> jax.Array:
    """Stochastic depth: drop entire residual branches per sample
    (``vit.py:227-242``).

    ``rate`` may be a Python float (sequential model — static per-layer
    rates) or a traced scalar (the pipeline's stacked-layer scan threads
    the per-layer rate as a scan operand, r5): ``bernoulli`` accepts a
    traced probability, and rate 0 degenerates to the identity exactly
    (keep=1 ⇒ the mask is all-True and x/1.0 is exact).
    """
    if deterministic or (isinstance(rate, (int, float)) and rate == 0.0):
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class HeadMergeProj(nn.Module):
    """Attention output projection that consumes [B, H, N, d] directly.

    Param layout is identical to a Dense over the merged heads
    (kernel [H·d, C], bias [C] — torch-converter compatible); the einsum
    contracts (h, d) so no [B,H,N,d]→[B,N,C] relayout is materialised.
    """

    features: int
    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, out4):
        kernel = self.param(
            "kernel", trunc_init,
            (self.heads * self.head_dim, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            jnp.float32,
        )
        if self.quant:
            b, h, n, d = out4.shape
            merged = out4.transpose(0, 2, 1, 3).reshape(b, n, h * d)
            y = _int8_forward(self, merged, kernel).astype(self.dtype)
            return y + bias.astype(self.dtype)
        w = kernel.reshape(self.heads, self.head_dim, self.features)
        y = jnp.einsum(
            "bhnd,hdc->bnc", out4, w.astype(self.dtype),
            precision=mm_precision(self.dtype),
        )
        return y + bias.astype(self.dtype)


class Attention(nn.Module):
    """Fused-QKV multi-head self-attention (``vit.py:39-72``).

    Compute path dispatches to the fused Pallas kernel on TPU via
    :func:`gavit_tpu.ops.attention.multi_head_attention`.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"
    quant: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_probs: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = QDense(
            3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
            quant=self.quant, name="qkv",
        )(x, fuse_bias_grad=not deterministic)
        qkv = qkv.reshape(b, n, 3, h, hd)
        # under tensor parallelism, pin heads to the 'model' axis so the
        # fused kernels run on each chip's local heads (no-op otherwise —
        # see parallel/op_sharding.py::head_shard_constraint)
        qkv = head_shard_constraint(qkv, head_dim=3)

        use_dropout = self.attn_drop > 0.0 and not deterministic
        if self.impl in ("auto", "pallas") and not use_dropout and not return_probs:
            # packed-QKV fused kernel (ops/attention.py) returning [B,H,N,d];
            # HeadMergeProj contracts (h, d) directly in its GEMM, so the
            # head merge needs no relayout (profiled: the output transpose
            # cost ~0.4 ms/block)
            # fwd_only=True would keep the v4 flat-row path for 384px
            # inference, but it measured SLOWER than v3 there (1.46 vs
            # 1.35 ms at b16·N=577 — the transpose is cheap at that batch
            # while the full 2.7 MB row residency pipelines worse), so the
            # dispatcher's max(fwd,bwd) rule stands for all calls
            out4 = fused_qkv_attention(qkv, hd ** -0.5, merge_heads=False)
            out = HeadMergeProj(
                features=c, heads=h, head_dim=hd, dtype=self.dtype,
                quant=self.quant, name="proj",
            )(out4)
            out = FusedDropout(self.proj_drop)(out, deterministic=deterministic)
            if return_probs:
                return out, None
            return out
        else:
            q = qkv[:, :, 0].transpose(0, 2, 1, 3)  # [B, H, N, hd]
            k = qkv[:, :, 1].transpose(0, 2, 1, 3)
            v = qkv[:, :, 2].transpose(0, 2, 1, 3)
            dropout_rng = self.make_rng("dropout") if use_dropout else None
            probs = None
            if return_probs:
                # interpretability capture needs the [B,H,N,N] probabilities,
                # which the fused kernels deliberately never materialise
                out, probs = attention_reference(
                    q, k, v, hd ** -0.5,
                    dropout_rate=self.attn_drop if not deterministic else 0.0,
                    dropout_rng=dropout_rng, return_probs=True,
                )
            else:
                out = multi_head_attention(
                    q, k, v, hd ** -0.5,
                    impl=self.impl,
                    dropout_rate=self.attn_drop if not deterministic else 0.0,
                    dropout_rng=dropout_rng,
                )
            out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = QDense(c, dtype=self.dtype, quant=self.quant, name="proj")(
            out, fuse_bias_grad=not deterministic)
        out = FusedDropout(self.proj_drop)(out, deterministic=deterministic)
        if return_probs:
            return out, probs
        return out


class Block(nn.Module):
    """Pre-LN transformer block with stochastic depth (``vit.py:97-119``)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    mlp_impl: str = "auto"
    quant: bool = False
    # sequence parallelism: keep the residual stream token-sharded along
    # 'model' through the LN/dropout/residual segments (config mesh.sp)
    sp: bool = False
    # non-None: this block's MLP is a mixture of experts (models/moe.py);
    # expert weights shard over the 'model' mesh axis (expert parallelism)
    moe: object = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_probs: bool = False,
                 drop_path_override=None):
        # drop_path_override: a TRACED per-layer stochastic-depth rate —
        # the pipeline trunk (parallel/pp.py) shares one static Block
        # configuration across its stacked-layer scan, so the linearly
        # decaying rates ride the scan as an operand and land here
        def maybe_drop_path(y):
            rate = (self.drop_path_rate if drop_path_override is None
                    else drop_path_override)
            engaged = (drop_path_override is not None
                       or self.drop_path_rate > 0.0)
            if engaged and not deterministic:
                return drop_path(
                    y, rate, deterministic, self.make_rng("dropout")
                )
            return y

        # NOTE: fusing branch-dropout + residual-add into one Pallas pass
        # (ops/dropout.py::fused_dropout_add) was measured SLOWER here
        # (+4.4 ms/step at ViT-B b128 — the kernel boundary costs more than
        # the saved dropout-intermediate round-trip; BASELINE.md round-2
        # table), so the Block keeps the separate kernel + XLA add.
        def residual(x, branch):
            y = x + maybe_drop_path(branch)
            if self.sp:
                y = seq_shard_constraint(y)
            return y

        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(x)
        attn_out = Attention(
            dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.drop, dtype=self.dtype,
            impl=self.attn_impl, quant=self.quant, name="attn",
        )(h.astype(self.dtype), deterministic, return_probs=return_probs)
        probs = None
        if return_probs:
            attn_out, probs = attn_out
        x = residual(x, attn_out)

        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x)
        if self.moe is not None:
            from gavit_tpu.models.moe import MoEMlp

            h = MoEMlp(
                cfg=self.moe, hidden_dim=int(self.dim * self.mlp_ratio),
                out_dim=self.dim, drop=self.drop, dtype=self.dtype,
                name="moe",
            )(h.astype(self.dtype), deterministic)
        else:
            h = Mlp(
                hidden_dim=int(self.dim * self.mlp_ratio), out_dim=self.dim,
                drop=self.drop, dtype=self.dtype, quant=self.quant,
                impl=self.mlp_impl, name="mlp",
            )(h.astype(self.dtype), deterministic)
        x = residual(x, h)
        if return_probs:
            return x, probs
        return x
