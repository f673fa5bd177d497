"""Mamba-2 (SSD) ops: chunked prefill scan, single-token recurrent decode,
and the short causal depthwise conv — all native JAX/XLA.

The reference delegates these to CUDA/Triton kernels (``mamba-ssm``
selective-scan + ``causal-conv1d``, SURVEY.md §2.9 N2/N3; used via
``create_block`` in zonos/backbone/_mamba_ssm.py:19-31). Here:

* **Prefill** uses the SSD chunked formulation (Mamba-2 paper): the sequence
  is split into chunks; intra-chunk work is dense attention-like einsums that
  map onto the MXU, and inter-chunk state is carried by a ``lax.scan`` —
  O(L·N) memory instead of materializing the full recurrent state history.
* **Decode** is the exact recurrence, one token per call, on a persistent
  ``[B, H, P, N]`` state (the TPU analogue of mamba-ssm's
  ``selective_state_update``).
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
