"""Mamba-2 (SSD) ops: chunked prefill scan, single-token recurrent decode,
and the short causal depthwise conv — all native JAX/XLA.

The reference delegates these to CUDA/Triton kernels (``mamba-ssm``
selective-scan + ``causal-conv1d``, SURVEY.md §2.9 N2/N3; used via
``create_block`` in zonos/backbone/_mamba_ssm.py:19-31). Here:

* **Prefill** uses the SSD chunked formulation (Mamba-2 paper): the sequence
  is split into chunks; intra-chunk work is dense attention-like einsums that
  map onto the MXU, and inter-chunk state is carried by a ``lax.scan`` —
  O(L·N) memory instead of materializing the full recurrent state history.
* **Decode** is the exact recurrence, one token per call (the TPU analogue
  of mamba-ssm's ``selective_state_update``). The persistent state is
  STORED lane-transposed ``[B, N, H*P]`` (:func:`state_to_lanes`) so the
  per-step math is VPU-lane-parallel; :func:`ssd_step_t` is the XLA form,
  ``ops/pallas/mamba_step.py`` the fused kernel. :func:`ssd_step` keeps
  the canonical ``[B, H, P, N]`` convention for tests/oracles.
* **Causal conv** keeps a rolling ``[B, d_conv-1, C]`` buffer for decode.

Recurrence (per head h, with A < 0):
  ``h_t = exp(dt_t A) h_{t-1} + dt_t * B_t x_t^T``,  ``y_t = C_t . h_t + D x_t``

Conventions: x ``[B, L, H, P]`` (P = headdim), dt ``[B, L, H]`` (already
softplus-ed, bias added), A ``[H]``, B/C ``[B, L, G, N]`` (G groups, heads
per group H/G), D ``[H]``. fp32 state math throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _group_expand(bc: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """``[B, L, G, N] -> [B, L, H, N]`` by repeating each group."""
    B, L, G, N = bc.shape
    rep = n_heads // G
    return jnp.repeat(bc, rep, axis=2)


def ssd_chunked(
    x: jnp.ndarray,  # [B, L, H, P]
    dt: jnp.ndarray,  # [B, L, H]
    A: jnp.ndarray,  # [H] (negative)
    Bm: jnp.ndarray,  # [B, L, G, N]
    Cm: jnp.ndarray,  # [B, L, G, N]
    D: jnp.ndarray,  # [H]
    chunk: int = 64,
    init_state: jnp.ndarray | None = None,  # [B, H, P, N]
):
    """Full-sequence SSD scan. Returns ``(y [B,L,H,P], final_state)``.

    L must be a multiple of ``chunk`` (pad with dt=0 — decay exp(0·A)=1 and
    contribution dt·B·x = 0, so padding is exact).
    """
    Bsz, L, H, P = x.shape
    N = Bm.shape[-1]
    pad = -L % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bm = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Cm = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Lp = L + pad
    nc = Lp // chunk

    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    Bh = _group_expand(Bm.astype(jnp.float32), H)  # [B, Lp, H, N]
    Ch = _group_expand(Cm.astype(jnp.float32), H)

    # Reshape into chunks: [B, nc, Q, ...]
    def chunked(a):
        return a.reshape((Bsz, nc) + (chunk,) + a.shape[2:])

    xc, dtc, Bc, Cc = map(chunked, (xf, dtf, Bh, Ch))
    dA = dtc * A.astype(jnp.float32)[None, None, None, :]  # [B, nc, Q, H]
    cs = jnp.cumsum(dA, axis=2)  # inclusive cumsum within chunk

    # Intra-chunk: scores[b,c,h,i,j] = (C_i . B_j) exp(cs_i - cs_j) dt_j, i>=j
    cb = jnp.einsum("bcihn,bcjhn->bchij", Cc, Bc)
    decay = jnp.exp(cs[:, :, :, None, :].transpose(0, 1, 4, 2, 3)
                    - cs[:, :, :, None, :].transpose(0, 1, 4, 3, 2))
    # decay[b,c,h,i,j] = exp(cs_i - cs_j)
    ii = jnp.arange(chunk)
    causal = (ii[:, None] >= ii[None, :])[None, None, None]
    scores = cb * jnp.where(causal, decay, 0.0) * dtc.transpose(0, 1, 3, 2)[:, :, :, None, :]
    y_intra = jnp.einsum("bchij,bcjhp->bcihp", scores, xc)

    # Inter-chunk state carry.
    if init_state is None:
        init_state = jnp.zeros((Bsz, H, P, N), jnp.float32)
    else:
        init_state = init_state.astype(jnp.float32)

    # Per-chunk aggregates:
    #   state_chunk[c] = sum_j exp(cs_Q - cs_j) dt_j B_j (x) x_j
    #   total_decay[c] = exp(cs_Q)
    last = cs[:, :, -1, :]  # [B, nc, H]
    seg = jnp.exp(last[:, :, None, :] - cs)  # [B, nc, Q, H]
    state_chunk = jnp.einsum(
        "bcjh,bcjhp,bcjhn->bchpn", seg * dtc, xc, Bc
    )  # [B, nc, H, P, N]
    total_decay = jnp.exp(last)  # [B, nc, H]

    def carry_fn(h, inputs):
        sc, td = inputs  # [B,H,P,N], [B,H]
        h_new = h * td[:, :, None, None] + sc
        return h_new, h  # emit state BEFORE this chunk

    _, h_prevs = jax.lax.scan(
        carry_fn,
        init_state,
        (state_chunk.transpose(1, 0, 2, 3, 4), total_decay.transpose(1, 0, 2)),
    )
    h_prevs = h_prevs.transpose(1, 0, 2, 3, 4)  # [B, nc, H, P, N]

    # y_state[b,c,i,h,p] = exp(cs_i) * C_i . h_prev
    y_state = jnp.einsum(
        "bcihn,bchpn->bcihp", Cc * jnp.exp(cs)[..., None], h_prevs
    )

    y = (y_intra + y_state).reshape(Bsz, Lp, H, P)
    y = y + xf * D.astype(jnp.float32)[None, None, :, None]
    y = y[:, :L]

    # Final state: run the carry one more step on the last chunk.
    h_last = h_prevs[:, -1] * total_decay[:, -1][:, :, None, None] + state_chunk[:, -1]
    return y.astype(x.dtype), h_last


def ssd_step(
    state: jnp.ndarray,  # [B, H, P, N] fp32
    x: jnp.ndarray,  # [B, H, P]
    dt: jnp.ndarray,  # [B, H]
    A: jnp.ndarray,  # [H]
    Bm: jnp.ndarray,  # [B, G, N]
    Cm: jnp.ndarray,  # [B, G, N]
    D: jnp.ndarray,  # [H]
):
    """One recurrent decode step. Returns ``(y [B,H,P], new_state)``."""
    H = x.shape[1]
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    Bh = _group_expand(Bm.astype(jnp.float32)[:, None], H)[:, 0]  # [B, H, N]
    Ch = _group_expand(Cm.astype(jnp.float32)[:, None], H)[:, 0]
    decay = jnp.exp(dtf * A.astype(jnp.float32)[None, :])  # [B, H]
    new_state = (
        state * decay[:, :, None, None]
        + jnp.einsum("bh,bhp,bhn->bhpn", dtf, xf, Bh)
    )
    y = jnp.einsum("bhn,bhpn->bhp", Ch, new_state)
    y = y + xf * D.astype(jnp.float32)[None, :, None]
    return y.astype(x.dtype), new_state


def state_to_lanes(h: jnp.ndarray) -> jnp.ndarray:
    """``[B, H, P, N] -> [B, N, H*P]`` — the lane-transposed STORAGE layout.

    Decode-step math in this layout is VPU-shaped: per-head scalars
    (decay, dt, D) broadcast as ``[1, H*P]`` lane vectors, B/C become
    sublane vectors ``[N, 1]``, the readout is a SUBLANE reduction whose
    result lands as a ``[1, H*P]`` lane vector, and the downstream
    silu-gate + gated RMSNorm stay fully lane-parallel (the native
    ``[B, H, P, N]`` layout left all post-readout work on 1 of 128 lanes —
    measured 11.5 -> 19.6 ms/step regression, docs/KERNELS.md)."""
    B, H, P, N = h.shape
    return h.transpose(0, 3, 1, 2).reshape(B, N, H * P)


def state_from_lanes(st: jnp.ndarray, nheads: int) -> jnp.ndarray:
    """``[B, N, H*P] -> [B, H, P, N]`` (inverse of :func:`state_to_lanes`)."""
    B, N, HP = st.shape
    P = HP // nheads
    return st.reshape(B, N, nheads, P).transpose(0, 2, 3, 1)


def _head_to_lanes(a: jnp.ndarray, P: int) -> jnp.ndarray:
    """Per-head ``[B, H] -> [B, H*P]`` (each head's value repeated over its
    P contiguous lanes; head-major flattening matches ``x.reshape(B, H*P)``)."""
    B, H = a.shape
    return jnp.broadcast_to(a[:, :, None], (B, H, P)).reshape(B, H * P)


def _group_to_lanes(a: jnp.ndarray, HP: int) -> jnp.ndarray:
    """Per-group ``[B, G] -> [B, H*P]`` (contiguous lane block per group —
    heads are grouped contiguously, matching :func:`_group_expand`)."""
    B, G = a.shape
    rep = HP // G
    return jnp.broadcast_to(a[:, :, None], (B, G, rep)).reshape(B, HP)


def ssd_step_t(
    state_t: jnp.ndarray,  # [B, N, H*P] (any float dtype; compute fp32)
    xs: jnp.ndarray,  # [B, H*P] head-major flat
    dt: jnp.ndarray,  # [B, H]
    A: jnp.ndarray,  # [H]
    Bm: jnp.ndarray,  # [B, G, N]
    Cm: jnp.ndarray,  # [B, G, N]
    D: jnp.ndarray,  # [H]
    nheads: int,
):
    """One recurrent decode step in the lane-transposed state layout
    (:func:`state_to_lanes`). Same math as :func:`ssd_step`, laid out so
    every elementwise op is lane-parallel. Returns ``(y [B, H*P],
    new_state_t [B, N, H*P] fp32)``."""
    B, N, HP = state_t.shape
    H, P, G = nheads, HP // nheads, Bm.shape[1]
    xf = xs.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    decay = _head_to_lanes(jnp.exp(dtf * A.astype(jnp.float32)[None, :]), P)
    dtxs = _head_to_lanes(dtf, P) * xf  # [B, HP]

    def bc_lanes(bc):  # [B, G, N] -> [B, N, HP]-broadcastable [B, N, G*rep]
        bcT = bc.astype(jnp.float32).transpose(0, 2, 1)  # [B, N, G]
        rep = HP // G
        return jnp.broadcast_to(
            bcT[:, :, :, None], (B, N, G, rep)
        ).reshape(B, N, HP)

    new_state = (
        state_t.astype(jnp.float32) * decay[:, None, :]
        + bc_lanes(Bm) * dtxs[:, None, :]
    )
    y = jnp.sum(bc_lanes(Cm) * new_state, axis=1)  # [B, HP]
    y = y + _head_to_lanes(
        jnp.broadcast_to(D.astype(jnp.float32)[None], (B, H)), P
    ) * xf
    return y.astype(xs.dtype), new_state


def ssd_naive(x, dt, A, Bm, Cm, D, init_state=None):
    """Sequential reference recurrence (slow; for tests)."""
    Bsz, L, H, P = x.shape
    N = Bm.shape[-1]
    state = (
        jnp.zeros((Bsz, H, P, N), jnp.float32)
        if init_state is None else init_state.astype(jnp.float32)
    )
    ys = []
    for t in range(L):
        y, state = ssd_step(state, x[:, t], dt[:, t], A, Bm[:, t], Cm[:, t], D)
        ys.append(y)
    return jnp.stack(ys, axis=1), state


# ---------------------------------------------------------------------------
# Causal depthwise conv (causal-conv1d equivalent, N3)
# ---------------------------------------------------------------------------

def causal_conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                  conv_state: jnp.ndarray | None = None):
    """Depthwise causal conv over ``[B, L, C]`` with kernel ``[K, C]``.

    ``conv_state`` (``[B, K-1, C]``) holds the trailing context from a
    previous call; returns ``(y [B, L, C], new_conv_state)``.
    """
    K = w.shape[0]
    Bsz, L, C = x.shape
    if conv_state is None:
        conv_state = jnp.zeros((Bsz, K - 1, C), x.dtype)
    xp = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)
    # Depthwise via feature_group_count
    y = jax.lax.conv_general_dilated(
        xp, w[:, None, :],  # [K, 1, C]
        window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
    )
    y = y + b[None, None, :]
    new_state = xp[:, -(K - 1):, :]
    return y, new_state


def causal_conv1d_step(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                       conv_state: jnp.ndarray):
    """Single-token causal conv: ``x [B, C]``, state ``[B, K-1, C]``."""
    K = w.shape[0]
    window = jnp.concatenate([conv_state, x[:, None, :]], axis=1)  # [B, K, C]
    y = jnp.einsum("bkc,kc->bc", window.astype(jnp.float32), w.astype(jnp.float32))
    y = (y + b.astype(jnp.float32)).astype(x.dtype)
    return y, window[:, 1:, :]
