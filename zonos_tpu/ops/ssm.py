"""Mamba2 selective state-space (SSD) ops.

Replaces the reference's mamba_ssm CUDA/Triton kernels
(zonos/backbone/_mamba_ssm.py:3-34) with a TPU-shaped formulation:

- Prefill uses the chunked SSD algorithm: within a chunk the recurrence is
  rewritten as a masked attention-like contraction (MXU matmuls), and chunk
  states are carried by a short ``lax.scan`` — O(L·Q) work with Q-sized
  matmul tiles instead of a length-L serial scan.
- Decode is the exact single-step recurrence on a carried ``[B, H, P, N]``
  state.

Shapes: x ``[B, L, H, P]`` (heads x headdim), dt ``[B, L, H]``,
A ``[H]`` (negative), B/C ``[B, L, G, N]`` (ngroups x state), D ``[H]``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _expand_groups(bc: jnp.ndarray, H: int) -> jnp.ndarray:
    """[B, L, G, N] -> [B, L, H, N] by repeating each group over its heads."""
    G = bc.shape[2]
    return jnp.repeat(bc, H // G, axis=2)


def ssd_chunked(
    x: jnp.ndarray,  # [B, L, H, P]
    dt: jnp.ndarray,  # [B, L, H]  (already softplus'd)
    A: jnp.ndarray,  # [H] negative decay rates
    Bm: jnp.ndarray,  # [B, L, G, N]
    Cm: jnp.ndarray,  # [B, L, G, N]
    D: jnp.ndarray,  # [H]
    init_state: jnp.ndarray | None = None,  # [B, H, P, N]
    chunk: int = 64,
):
    """Full-sequence SSD. Returns (y [B, L, H, P], final_state [B, H, P, N]).

    Kernel dispatch: the fused Pallas SSD kernel is the DEFAULT on TPU —
    measured end-to-end through the public hybrid generate it cuts flagship
    prefill wall 9.1% with a 960-frame audio prefix (159.0 -> 144.5 ms)
    and 5.6% at ordinary request lengths; streaming TTFA is unchanged
    (decode-dominated).  tools/ssd_e2e_bench.py, r5; kernel-level history
    in ops/pallas_ssm.py.  ``ZONOS_TPU_PALLAS_SSM=0`` pins this op to the
    XLA formulation (which remains the CPU path and the numerical oracle);
    note the kernel's different reduction order can flip near-tied greedy
    argmax picks vs the XLA path — runs are self-consistent either way.
    """
    ssm_env = os.environ.get("ZONOS_TPU_PALLAS_SSM")
    if ssm_env == "0":
        use_kernel = False
    else:
        from zonos_tpu.utils.device import on_tpu

        use_kernel = on_tpu()
        # Default-path batch guard: past 16 rows Mosaic's scoped-VMEM stack
        # for this kernel exceeds the 16 MB limit at flagship width
        # (measured on v5e: 16 rows compile, 32 rows OOM by ~2 MB — the
        # CFG-doubled batch-64 suite row hit it).  The measured end-to-end
        # win is a small-batch prefill effect (long-form carry, voice
        # clone, TTFA) anyway; large batches take the XLA formulation.
        # ZONOS_TPU_PALLAS_SSM=1 bypasses the guard (explicit opt-in).
        if use_kernel and ssm_env != "1" and x.shape[0] > 16:
            use_kernel = False
    if use_kernel and Bm.shape[2] == 1:
        from zonos_tpu.ops.pallas_ssm import ssd_chunked_pallas

        return ssd_chunked_pallas(x, dt, A, Bm, Cm, D, init_state=init_state, chunk=chunk)

    Bsz, L, H, P = x.shape
    N = Bm.shape[-1]
    pad = (-L) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bm = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Cm = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Lp = L + pad
    nc = Lp // chunk

    Bh = _expand_groups(Bm, H)
    Ch = _expand_groups(Cm, H)

    # reshape into chunks: [B, nc, Q, ...]
    def chk(t):
        return t.reshape(Bsz, nc, chunk, *t.shape[2:])

    xc, dtc, Bc, Cc = chk(x), chk(dt), chk(Bh), chk(Ch)

    dA = dtc * A[None, None, None, :]  # [B, nc, Q, H]
    s = jnp.cumsum(dA, axis=2)  # within-chunk cumulative log-decay

    # intra-chunk: Y[i] = sum_{j<=i} (C_i . B_j) exp(s_i - s_j) dt_j x_j
    decay = jnp.exp(s[:, :, :, None, :] - s[:, :, None, :, :])  # [B,nc,Q(i),Q(j),H]
    causal = jnp.tril(jnp.ones((chunk, chunk), bool))
    decay = jnp.where(causal[None, None, :, :, None], decay, 0.0)
    cb = jnp.einsum("bnihs,bnjhs->bnijh", Cc, Bc)  # [B,nc,Q,Q,H]
    w = cb * decay * dtc[:, :, None, :, :]  # weight for x_j
    y_intra = jnp.einsum("bnijh,bnjhp->bnihp", w, xc)

    # chunk summary state: S_chunk = sum_j exp(s_Q - s_j) dt_j x_j B_j^T
    tail_decay = jnp.exp(s[:, :, -1:, :] - s)  # [B,nc,Q,H]
    contrib = xc * (dtc * tail_decay)[..., None]  # [B,nc,Q,H,P]
    S_chunk = jnp.einsum("bnqhp,bnqhs->bnhps", contrib, Bc)  # [B,nc,H,P,N]
    chunk_decay = jnp.exp(s[:, :, -1, :])  # [B,nc,H] total decay of a chunk

    # scan chunk states: h_out[n] = state *before* chunk n
    h0 = (
        jnp.zeros((Bsz, H, P, N), x.dtype)
        if init_state is None
        else init_state.astype(x.dtype)
    )

    def scan_fn(h, inp):
        S_c, dec = inp  # [B,H,P,N], [B,H]
        h_next = h * dec[..., None, None] + S_c
        return h_next, h

    S_sw = jnp.moveaxis(S_chunk, 1, 0)  # [nc, B, H, P, N]
    dec_sw = jnp.moveaxis(chunk_decay, 1, 0)  # [nc, B, H]
    h_final, h_befores = jax.lax.scan(scan_fn, h0, (S_sw, dec_sw))
    h_befores = jnp.moveaxis(h_befores, 0, 1)  # [B, nc, H, P, N]

    # inter-chunk: Y[i] += (C_i exp(s_i)) . h_before
    y_inter = jnp.einsum(
        "bnqhs,bnhps->bnqhp", Cc * jnp.exp(s)[..., None], h_befores
    )

    y = (y_intra + y_inter).reshape(Bsz, Lp, H, P)[:, :L]
    y = y + x[:, :L] * D[None, None, :, None]
    return y, h_final


def _state_contract(state: jnp.ndarray, Ch: jnp.ndarray) -> jnp.ndarray:
    """y[b,h,p] = Σ_n state[b,h,p,n]·C[b,h,n] — the per-step SSM output
    contraction.  Default: the plain per-(b,h) matvec (VPU lane reduction).

    An MXU reformulation (``ZONOS_TPU_SSM_CONTRACT=mxu``) was the r3
    verdict's named escape hatch for the hybrid's ~30-RTF guidance-on
    ceiling, hypothesized to beat the "VPU cross-lane floor" (0.558
    ms/layer at flagship batch 64).  Head-batched block-diagonal form:
    group TB (b,h) pairs and compute

        Z[g, t, u·P+p] = Σ_n C[g,t,n] · state[g,u,p,n]

    — a [TB, N] × [N, TB·P] batched matmul (TB× the FLOPs, ~2 GFLOP —
    noise), diagonal (u == t) via a one-hot contraction over SECOND-MINOR
    axes so nothing pads to 128 lanes; bf16 operands because a dot cannot
    consume a fused convert (an fp32 operand materializes a 268 MB upcast —
    measured slower still).

    **Measured (v5e, flagship batch 64, f8 state, ms/layer)**: contraction
    alone 0.551 MXU vs 0.581 VPU — parity; FULL state pipeline 0.854 MXU vs
    0.699 VPU — a 22% LOSS (bf16 state: 1.055 vs 0.833).  Mechanism: the
    dot splits the state's two consumers (reduce + update) into separate
    HBM passes, losing the multi-output fusion that lets XLA share one
    state read, and the block-diagonal Z adds ~17 MB/layer of traffic.
    Every formulation (VPU matvec, MXU dot, f8/bf16/fp32 storage) converges
    to ~0.55-0.85 ms/layer — the floor is the state's per-value trip
    through the compute units, not the cross-lane reduce op count, so the
    MXU cannot buy it back.  Kept as an opt-in measured negative result;
    tests/test_hybrid.py asserts the two forms agree.
    """
    import os

    B_, H, P, N = state.shape
    BH = B_ * H
    mode = os.environ.get("ZONOS_TPU_SSM_CONTRACT", "vpu")
    use_mxu = {"auto": BH >= 512, "mxu": True, "vpu": False}[mode]
    TB = 8
    while BH % TB:
        TB //= 2
    if not use_mxu or TB == 1:
        return jnp.einsum("bhpn,bhn->bhp", state, Ch)
    g = BH // TB
    # Feed the dot bf16 OPERANDS (fp32 accumulation): a dot cannot consume a
    # fused convert, so an fp32 operand forces XLA to materialize the
    # upcast of the whole state (268 MB/layer at flagship batch 64 — slower
    # than the VPU floor, measured).  With bf16 the convert chain from bf16
    # storage cancels entirely (the dot reads the stored buffer) and f8
    # storage pays one half-size materialization.  Same precision class as
    # every other serving matmul (bf16 multiply, fp32 accumulate).
    S_ = state.astype(jnp.bfloat16).reshape(g, TB * P, N)
    C_ = Ch.astype(jnp.bfloat16).reshape(g, TB, N)
    Z = jnp.einsum("gmn,gtn->gtm", S_, C_,
                   preferred_element_type=jnp.float32)  # MXU dot, m = u·P+p
    Zr = Z.reshape(g, TB, TB, P)
    eye = jnp.eye(TB, dtype=Z.dtype)
    return jnp.einsum("gtup,tu->gtp", Zr, eye).reshape(B_, H, P)


def ssd_decode_step(
    x: jnp.ndarray,  # [B, H, P]
    dt: jnp.ndarray,  # [B, H]
    A: jnp.ndarray,  # [H]
    Bm: jnp.ndarray,  # [B, G, N]
    Cm: jnp.ndarray,  # [B, G, N]
    D: jnp.ndarray,  # [H]
    state: jnp.ndarray,  # [B, H, P, N]
):
    """One recurrence step. Returns (y [B, H, P], new_state).

    The output is computed from the OLD state:
        y = C·(dA·s + dt·x⊗B) = dA·(C·s) + (B·C)·dt·x
    — same algebra, expressed so the [B,H,P,N] state has one reducing
    consumer (C·s) and one mapping consumer (decay+update) over the same
    buffer.  The reducing consumer runs on the MXU at large batch
    (``_state_contract``); the update is pure map work.  The state IS the
    dominant HBM traffic of large-batch hybrid decode (~134 MB/layer fp32
    at batch 128 on the flagship, read+written every step) — storage is
    shrunk via ``ZONOS_TPU_SSM_STATE`` (models/hybrid.py): fp32 17.1 -> f8
    30.6 RTF at batch 64 pre-MXU-contraction (docs/PERFORMANCE.md has the
    precision ladder and floor breakdown)."""
    Bh = jnp.repeat(Bm, x.shape[1] // Bm.shape[1], axis=1)  # [B, H, N]
    Ch = jnp.repeat(Cm, x.shape[1] // Cm.shape[1], axis=1)
    dA = jnp.exp(dt * A[None, :])  # [B, H]
    xdt = x * dt[..., None]  # [B, H, P]
    y_state = _state_contract(state, Ch)  # C·s_old
    bc = jnp.einsum("bhn,bhn->bh", Bh, Ch)  # B·C (scalar per head)
    y = dA[..., None] * y_state + bc[..., None] * xdt + x * D[None, :, None]
    state = state * dA[..., None, None] + jnp.einsum("bhp,bhn->bhpn", xdt, Bh)
    return y, state


def causal_conv1d_prefill(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray):
    """Depthwise causal conv over [B, L, C] with kernel [K, C].

    Returns (y [B, L, C], conv_state [B, K-1, C]) — the state is the tail of
    the padded input, ready for streaming decode.
    """
    K = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (K - 1, 0), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp,
        w[:, None, :],  # [K, 1, C] with feature_group_count=C
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1],
    )
    y = y + b
    conv_state = xp[:, -(K - 1) :, :] if K > 1 else jnp.zeros((x.shape[0], 0, x.shape[-1]), x.dtype)
    return y, conv_state


def causal_conv1d_step(x: jnp.ndarray, conv_state: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray):
    """One streaming step: x [B, C], conv_state [B, K-1, C] -> (y [B, C], state)."""
    window = jnp.concatenate([conv_state, x[:, None, :]], axis=1)  # [B, K, C]
    y = jnp.einsum("bkc,kc->bc", window, w) + b
    return y, window[:, 1:, :]
