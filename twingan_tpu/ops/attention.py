"""SAGAN self-attention core: softmax(f g^T) h over N = H*W spatial positions.

Reference parity: /root/reference/libs/self_attention.py:24-70. The 1x1
convolutions producing f (tanh, C/8), g (tanh, C/8) and h (C) live in the
Flax layer; this module computes the N^2 attention itself.

TPU design: the dense N x N score matrix is the only quadratic op in the
framework (SURVEY.md section 5.7). Two paths:

- ``attention_core``: plain einsum. XLA tiles the batched matmuls onto the
  MXU; fine up to N = 64^2 = 4096 (the default self_attention_hw).
- ``flash_attention_core``: a blockwise Pallas kernel (flash-attention style,
  no N^2 materialization in HBM) for the 512px stretch config where N can be
  16k+. Both directions are blockwise: the forward keeps an online-softmax
  state in VMEM scratch and additionally emits the per-row logsumexp; the
  backward recomputes p = exp(s - lse) one (q-block, k-block) tile at a time
  in two kernels (dF over sequential k-blocks; dG/dH over sequential
  q-blocks), so training at N = 65536 never materializes the N^2 matrix
  either. Gradients are exact (tested against the einsum VJP), and the
  einsum path remains the small-N fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pltpu is only importable with a TPU-capable jaxlib; guard for CPU tests.
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def attention_core(f: jax.Array, g: jax.Array, h: jax.Array) -> jax.Array:
    """o[b,i,:] = sum_j softmax_j(f[b,i] . g[b,j]) h[b,j].

    f, g: [B, N, C_bar]; h: [B, N, C]. Accumulates in fp32 on the MXU.
    """
    scores = jnp.einsum("bic,bjc->bij", f, g, preferred_element_type=jnp.float32)
    beta = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bij,bjc->bic", beta.astype(h.dtype), h, preferred_element_type=jnp.float32)
    return o.astype(h.dtype)


def _interpret() -> bool:
    # Pallas compiles only on TPU; interpret mode keeps CPU tests exact.
    return jax.default_backend() != "tpu"


def _flash_kernel(f_ref, g_ref, h_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr):
    """One (batch, q-block, k-block) program. Pallas iterates the LAST grid
    dimension sequentially, so the online-softmax state (m, l, acc) carries
    across k-blocks in VMEM scratch; only one key block is resident at a
    time (bounded VMEM at any N). Emits the per-row logsumexp for the
    blockwise backward."""
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    f = f_ref[0].astype(jnp.float32)  # [block_q, c_bar]
    g_blk = g_ref[0].astype(jnp.float32)  # [block_k, c_bar]
    h_blk = h_ref[0].astype(jnp.float32)  # [block_k, c]
    s = jnp.dot(f, g_blk.T, preferred_element_type=jnp.float32)  # [bq, bk]
    m_prev = m_scr[:, 0]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    p = jnp.exp(s - m_new[:, None])
    scale = jnp.exp(m_prev - m_new)
    m_scr[:, 0] = m_new
    l_scr[:, 0] = l_scr[:, 0] * scale + jnp.sum(p, axis=-1)
    acc_scr[:] = acc_scr[:] * scale[:, None] + jnp.dot(
        p, h_blk, preferred_element_type=jnp.float32
    )

    @pl.when(ki == num_k - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:, 0][:, None]).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[:, 0] + jnp.log(l_scr[:, 0])


def _flash_forward(f, g, h, block_q: int, block_k: int):
    """Returns (o, lse); lse is the fp32 per-row logsumexp [B, N].

    Row-wise tensors (lse, and delta in the backward) travel as [B, 1, N]
    through the pallas boundary: the TPU lowering requires each block's
    last two dims to be (divisible by 8, divisible by 128) or equal to the
    array dims — a [B, N] block of (1, block_q) violates the sublane rule
    for any B > 1 (found the first time the 512px stretch config compiled
    the kernel on a real chip, round 4)."""
    b, n, c_bar = f.shape
    c = h.shape[-1]
    grid = (b, n // block_q, n // block_k)
    o, lse = pl.pallas_call(
        _flash_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), h.dtype),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c_bar), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_k, c_bar), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, qi, ki: (bi, ki, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, c), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bi, qi, ki: (bi, 0, qi)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max m
            pltpu.VMEM((block_q, 1), jnp.float32),  # running denom l
            pltpu.VMEM((block_q, c), jnp.float32),  # weighted-value acc
        ],
        interpret=_interpret(),
    )(f, g, h)
    return o, lse.reshape(b, n)


def _flash_dq_kernel(f_ref, g_ref, h_ref, do_ref, lse_ref, delta_ref,
                     df_ref, df_scr):
    """dF over sequential k-blocks: df[i] += sum_j ds[i,j] g[j], with
    ds = p * (do h^T - delta) and p = exp(f g^T - lse) recomputed per tile."""
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        df_scr[:] = jnp.zeros_like(df_scr)

    f = f_ref[0].astype(jnp.float32)
    g_blk = g_ref[0].astype(jnp.float32)
    h_blk = h_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = jnp.dot(f, g_blk.T, preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    dp = jnp.dot(do, h_blk.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0][:, None])
    df_scr[:] += jnp.dot(ds, g_blk, preferred_element_type=jnp.float32)

    @pl.when(ki == num_k - 1)
    def _():
        df_ref[0] = df_scr[:].astype(df_ref.dtype)


def _flash_dkv_kernel(f_ref, g_ref, h_ref, do_ref, lse_ref, delta_ref,
                      dg_ref, dh_ref, dg_scr, dh_scr):
    """dG/dH over sequential q-blocks: dg[j] += sum_i ds[i,j] f[i],
    dh[j] += sum_i p[i,j] do[i]."""
    qi = pl.program_id(2)
    num_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dg_scr[:] = jnp.zeros_like(dg_scr)
        dh_scr[:] = jnp.zeros_like(dh_scr)

    f = f_ref[0].astype(jnp.float32)
    g_blk = g_ref[0].astype(jnp.float32)
    h_blk = h_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = jnp.dot(f, g_blk.T, preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse_ref[0, 0][:, None])  # [bq, bk]
    dp = jnp.dot(do, h_blk.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0, 0][:, None])
    dg_scr[:] += jnp.dot(ds.T, f, preferred_element_type=jnp.float32)
    dh_scr[:] += jnp.dot(p.T, do, preferred_element_type=jnp.float32)

    @pl.when(qi == num_q - 1)
    def _():
        dg_ref[0] = dg_scr[:].astype(dg_ref.dtype)
        dh_ref[0] = dh_scr[:].astype(dh_ref.dtype)


def _flash_backward(f, g, h, do, lse, delta, block_q: int, block_k: int):
    b, n, c_bar = f.shape
    c = h.shape[-1]
    interpret = _interpret()
    # Row-wise inputs as [B, 1, N] (see _flash_forward on TPU block rules).
    lse = lse.reshape(b, 1, n)
    delta = delta.reshape(b, 1, n)
    q_spec = pl.BlockSpec((1, block_q, c_bar), lambda bi, qi, ki: (bi, qi, 0))
    k_spec = pl.BlockSpec((1, block_k, c_bar), lambda bi, qi, ki: (bi, ki, 0))
    v_spec = pl.BlockSpec((1, block_k, c), lambda bi, qi, ki: (bi, ki, 0))
    do_spec = pl.BlockSpec((1, block_q, c), lambda bi, qi, ki: (bi, qi, 0))
    row_spec = pl.BlockSpec((1, 1, block_q), lambda bi, qi, ki: (bi, 0, qi))
    df = pl.pallas_call(
        _flash_dq_kernel,
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        grid=(b, n // block_q, n // block_k),
        in_specs=[q_spec, k_spec, v_spec, do_spec, row_spec, row_spec],
        out_specs=q_spec,
        scratch_shapes=[pltpu.VMEM((block_q, c_bar), jnp.float32)],
        interpret=interpret,
    )(f, g, h, do, lse, delta)

    # Grid order (b, k-block, q-block): q is the sequential carry axis.
    q_spec2 = pl.BlockSpec((1, block_q, c_bar), lambda bi, ki, qi: (bi, qi, 0))
    k_spec2 = pl.BlockSpec((1, block_k, c_bar), lambda bi, ki, qi: (bi, ki, 0))
    v_spec2 = pl.BlockSpec((1, block_k, c), lambda bi, ki, qi: (bi, ki, 0))
    do_spec2 = pl.BlockSpec((1, block_q, c), lambda bi, ki, qi: (bi, qi, 0))
    row_spec2 = pl.BlockSpec((1, 1, block_q), lambda bi, ki, qi: (bi, 0, qi))
    dg, dh = pl.pallas_call(
        _flash_dkv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(g.shape, g.dtype),
            jax.ShapeDtypeStruct(h.shape, h.dtype),
        ),
        grid=(b, n // block_k, n // block_q),
        in_specs=[q_spec2, k_spec2, v_spec2, do_spec2, row_spec2, row_spec2],
        out_specs=(k_spec2, v_spec2),
        scratch_shapes=[
            pltpu.VMEM((block_k, c_bar), jnp.float32),
            pltpu.VMEM((block_k, c), jnp.float32),
        ],
        interpret=interpret,
    )(f, g, h, do, lse, delta)
    return df, dg, dh


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_core(
    f: jax.Array, g: jax.Array, h: jax.Array, block_q: int = 256, block_k: int = 512
) -> jax.Array:
    """Blockwise (flash) attention; exact same math as ``attention_core``.

    N must be divisible by BOTH block sizes: the grid uses floor division,
    so a remainder would mean output rows that are never written
    (uninitialized HBM on TPU) — rejected loudly here instead.
    """
    if pltpu is None:
        raise RuntimeError(
            "flash attention unavailable: jax.experimental.pallas.tpu failed "
            "to import on this jaxlib; use attention_core (einsum) instead")
    n = f.shape[1]
    if n % block_q or n % block_k:
        raise ValueError(
            f"flash attention needs N divisible by block_q={block_q} and "
            f"block_k={block_k}, got N={n}")
    return _flash_forward(f, g, h, block_q, block_k)[0]


def _flash_fwd(f, g, h, block_q, block_k):
    o, lse = _flash_forward(f, g, h, block_q, block_k)
    return o, (f, g, h, o, lse)


def _flash_bwd(block_q, block_k, res, do):
    # Blockwise backward (flash-attention style): recompute p = exp(s - lse)
    # per tile; delta[i] = do[i].o[i] folds the softmax Jacobian's rank-1
    # term. O(N) memory — the einsum VJP's N^2 buffer (17 GB at N=65536)
    # never exists.
    f, g, h, o, lse = res
    delta = jnp.einsum(
        "bic,bic->bi", do.astype(jnp.float32), o.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return _flash_backward(f, g, h, do, lse, delta, block_q, block_k)


flash_attention_core.defvjp(_flash_fwd, _flash_bwd)


def self_attention(
    f: jax.Array,
    g: jax.Array,
    h: jax.Array,
    *,
    use_flash: bool | None = None,
    block_q: int = 256,
    block_k: int = 512,
) -> jax.Array:
    """Dispatch between the einsum and Pallas paths.

    f/g/h are the flattened [B, N, C'] projections. By default the Pallas
    kernel is used on TPU when N is large enough to both fill a block and
    benefit from avoiding the N^2 HBM round-trip.
    """
    n = f.shape[1]
    if use_flash is None:
        on_tpu = jax.default_backend() == "tpu"
        use_flash = (on_tpu and pltpu is not None and n >= 4096
                     and n % block_q == 0 and n % block_k == 0)
    if use_flash:
        return flash_attention_core(f, g, h, block_q, block_k)
    return attention_core(f, g, h)


def sharded_attention_core(
    f: jax.Array,
    g: jax.Array,
    h: jax.Array,
    mesh,
    axis: str = "data",
) -> jax.Array:
    """Context-parallel attention: the N spatial positions sharded across a
    mesh axis (SURVEY.md section 5.7 — the one faithful 'sequence
    parallelism' extension this workload admits, for 512px+ stretch configs).

    Queries stay sharded; keys/values are all-gathered over ICI inside
    shard_map, so each device computes its N/devices query rows against the
    full key set. Exact same math as attention_core.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(f_blk, g_blk, h_blk):
        g_full = lax.all_gather(g_blk, axis, axis=1, tiled=True)
        h_full = lax.all_gather(h_blk, axis, axis=1, tiled=True)
        return attention_core(f_blk, g_full, h_full)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None),) * 3,
        out_specs=P(None, axis, None),
    )(f, g, h)
