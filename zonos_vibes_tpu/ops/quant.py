"""Weight-only int8 quantization for the decode hot path.

Single-stream decode is weight-bandwidth-bound (~3.2 GB of bf16 parameter
reads per step at flagship scale — docs/KERNELS.md): storing the backbone
projections as int8 + per-output-channel scales halves the HBM traffic the
roofline is made of. The dequant (int8 -> bf16 convert + scale multiply)
fuses into the matmul's operand read on TPU — weights cross HBM as int8.

Scheme: symmetric per-output-channel absmax (`w_q = round(w / s)`,
`s = absmax(col) / 127`), the standard weight-only recipe; activations stay
bf16, accumulation fp32 via the usual dot. Quality impact of weight-only
int8 at this scale is well below the bf16 noise floor of the sampler.

Layout: a quantized projection leaf is ``{"weight_int8": [.., in, out] i8,
"scale": [.., 1, out] f32}`` — same tree positions as the bf16 ``weight``
leaves, so partition specs keep working (the contraction layouts are
unchanged).
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp


def _gptq_compensate(w32, H, qmax: float, group_size: int,
                     clip_search: bool):
    """GPTQ-style sequential error compensation (VERDICT r4 #2) for ONE
    ``[in, out]`` fp32 weight: quantize contraction rows in order and fold
    each row's rounding error into the not-yet-quantized rows, weighted by
    the inverse-Hessian Cholesky (Frantar et al. 2022, the standard
    published recipe — re-derived here in numpy, blocked per scale group).
    ``H ~ E[x xᵀ]`` over the projection's input distribution. Group scales
    are computed at group ENTRY from the error-compensated residual rows
    (with the same per-column MSE clip search as the RTN path), so the
    grouped-matmul layout/scales contract is unchanged.

    Returns ``(q int8 [in, out], scale fp32 [G, out])`` with ``G = in /
    group_size``. Error for a gaussian-iid row layout equals plain RTN
    when ``H = I``; gains come from non-isotropic inputs (the gated-MLP
    fc2 input is strongly non-isotropic even at random init; real
    checkpoints more so)."""
    import numpy as np

    in_dim, out = w32.shape
    assert in_dim % group_size == 0
    w = w32.astype(np.float32).copy()
    damp = 0.05 * float(np.mean(np.diag(H))) + 1e-8
    Hd = H.astype(np.float64) + np.eye(in_dim) * damp
    Hinv = np.linalg.inv(Hd)
    # Upper-triangular U with Uᵀ U = H⁻¹ (torch.linalg.cholesky(·,
    # upper=True) in the reference recipe == lower-chol transposed).
    U = np.linalg.cholesky(Hinv).T.astype(np.float32)
    q = np.zeros((in_dim, out), np.int8)
    scales = np.zeros((in_dim // group_size, out), np.float32)
    clips = (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7, 0.65) if clip_search \
        else (1.0,)
    for g0 in range(0, in_dim, group_size):
        g1 = g0 + group_size
        blk = w[g0:g1]
        absmax = np.max(np.abs(blk), axis=0)  # [out]
        best_s, best_err = None, None
        for c in clips:
            s = np.where(absmax > 0, absmax * c / qmax, 1.0)
            qc = np.clip(np.round(blk / s), -qmax, qmax)
            err = ((qc * s - blk) ** 2).sum(axis=0)
            if best_err is None:
                best_s, best_err = s, err
            else:
                better = err < best_err
                best_s = np.where(better, s, best_s)
                best_err = np.minimum(best_err, err)
        s = best_s.astype(np.float32)
        scales[g0 // group_size] = s
        errs = np.zeros((group_size, out), np.float32)
        for i in range(g0, g1):
            d = U[i, i]
            qi = np.clip(np.round(w[i] / s), -qmax, qmax)
            q[i] = qi.astype(np.int8)
            errs[i - g0] = (w[i] - qi * s) / d
            if i + 1 < g1:  # in-group compensation, rank-1
                w[i + 1: g1] -= np.outer(U[i, i + 1: g1], errs[i - g0])
        if g1 < in_dim:  # cross-group compensation, one GEMM per group
            w[g1:] -= U[g0:g1, g1:].T @ errs
    return q, scales


def fc2_hessian_mc(w1, n_samples: int = 3072, seed: int = 0):
    """Monte-Carlo input Hessian ``H = E[h hᵀ]`` for a gated-MLP second
    projection: sample the fc1 input as iid standard normal (the LayerNorm
    output proxy — unit per-channel variance), push it through fc1 +
    the SiLU gate (ops/mlp.swiglu semantics: ``h = y * silu(gate)``), and
    accumulate ``hᵀh / n``. Even at random init H is strongly
    non-isotropic (per-channel energies vary with fc1 column norms and the
    gate's nonlinearity), which is what GPTQ compensation exploits.
    ``w1``: fp32/bf16 host ``[d_model, 2*d_ff]``."""
    import numpy as np

    w1 = np.asarray(w1, np.float32)
    d_ff = w1.shape[-1] // 2
    H = np.zeros((d_ff, d_ff), np.float64)
    rng = np.random.default_rng(seed)
    chunk = 512
    done = 0
    while done < n_samples:
        m = min(chunk, n_samples - done)
        x = rng.standard_normal((m, w1.shape[0])).astype(np.float32)
        z = x @ w1
        y, g = z[:, :d_ff], z[:, d_ff:]
        # Stable SiLU: sigmoid via tanh avoids exp overflow for large |g|.
        h = y * (g * (0.5 * (1.0 + np.tanh(0.5 * g))))
        H += (h.T @ h).astype(np.float64)
        done += m
    return (H / n_samples).astype(np.float32)


def _rtn_groupquant(w32, qmax: float, group_size: int | None,
                    clip_search: bool):
    """Round-to-nearest + per-out-column absmax scales, optionally with
    ``group_size``-row sub-channel scale groups and the per-column MSE
    clip search — pure numpy (host-side, also reused by the AWQ alpha
    search, :func:`awq_fold`). Returns ``(q int8, scale fp32)`` in the
    stored grouped shape: ``q [..., G, group, out]`` + ``scale [..., G,
    1, out]`` when grouped, else ``q [..., in, out]`` + ``scale [..., 1,
    out]``."""
    import numpy as np

    if group_size is not None:
        G = w32.shape[-2] // group_size
        w32 = w32.reshape(*w32.shape[:-2], G, group_size, w32.shape[-1])
    absmax = np.max(np.abs(w32), axis=-2, keepdims=True)  # [..., 1, out]
    scale = np.where(absmax > 0, absmax / qmax, 1.0).astype(np.float32)
    q = np.clip(np.round(w32 / scale), -qmax, qmax).astype(np.int8)
    if clip_search:
        err = ((q * scale - w32) ** 2).sum(axis=-2, keepdims=True)
        for c in (0.95, 0.9, 0.85, 0.8, 0.75, 0.7, 0.65):
            s_c = np.where(absmax > 0, absmax * c / qmax, 1.0).astype(np.float32)
            q_c = np.clip(np.round(w32 / s_c), -qmax, qmax).astype(np.int8)
            err_c = ((q_c * s_c - w32) ** 2).sum(axis=-2, keepdims=True)
            better = err_c < err
            q = np.where(better, q_c, q)
            scale = np.where(better, s_c, scale)
            err = np.minimum(err, err_c)
    return q, scale


def quantize_weight(w: jnp.ndarray, bits: int = 8,
                    group_size: int | None = None,
                    clip_search: bool = False,
                    fake: bool = False,
                    gptq_h=None,
                    fake_dtype=None) -> dict:
    """``[..., in, out]`` float -> int8/int4 + per-out-channel scale (fp32).
    Leading axes (e.g. the stacked-layer axis) are preserved. Quantization
    math runs HOST-side (numpy): it is one-time load work, and doing it on
    device would spike HBM with fp32 copies of multi-GB stacked tensors.

    ``bits=4`` (phase 3, experimental): values live as XLA ``s4`` on device
    (packed two-per-byte in HBM — quarter the bf16 weight read). The
    per-out-channel scale commutes with the contraction exactly like int8,
    so the dequant stays a fused operand convert + one post-dot rescale.

    ``group_size`` (int4 quality fix, VERDICT r3 #4): sub-channel scales
    over ``group_size``-row groups of the contraction axis — the standard
    grouped-scale int4 recipe. The weight becomes ``[..., G, group, out]``
    with scale ``[..., G, 1, out]``; the matmul turns into a G-batched dot
    with a post-dot per-group rescale and a group-sum (proj_matmul), so the
    weight still crosses HBM packed. ``clip_search`` picks, per scale
    column, the MSE-optimal clip factor in [0.65, 1.0] of absmax (absmax is
    not MSE-optimal at 15 levels; clipping trades rare saturation for a
    ~20% smaller step on gaussian columns).

    int4's residual ~11-14% per-weight noise is inherent to 15 levels —
    serving quality is the caller's tradeoff; heads/embeddings never go
    below int8."""
    import numpy as np

    assert bits in (8, 4), bits
    qmax = 127.0 if bits == 8 else 7.0
    w32 = np.asarray(jax.device_get(w), np.float32)
    grouped = (
        bits == 4 and group_size is not None
        and w32.shape[-2] % group_size == 0 and w32.shape[-2] > group_size
    )
    if gptq_h is not None and bits == 4 and grouped:
        # Error-compensated path: per leading index (stacked layer), build
        # the input Hessian lazily (``gptq_h(idx) -> [in, in]``; a 26-layer
        # stack of 8k² Hessians would not fit in host RAM at once) and run
        # the blocked GPTQ sweep.
        lead = w32.shape[:-2]
        in_dim, out = w32.shape[-2:]
        G = in_dim // group_size
        q = np.zeros(w32.shape, np.int8)
        sc = np.zeros((*lead, G, out), np.float32)
        for idx in (np.ndindex(*lead) if lead else [()]):
            q[idx], sc[idx] = _gptq_compensate(
                w32[idx], gptq_h(idx), qmax, group_size, clip_search
            )
        q = q.reshape(*lead, G, group_size, out)
        scale = sc[..., :, None, :]  # [..., G, 1, out]
    else:
        q, scale = _rtn_groupquant(
            w32, qmax, group_size if grouped else None, clip_search
        )
    if fake:
        # Quantize->dequantize entirely HOST-side: numerically equivalent
        # to the packed path up to ONE extra bf16 rounding of each q*scale
        # product (the deployed kernel converts the small-int q exactly
        # and applies the scale post-dot in fp32; here the dequantized
        # weight is stored in the weight dtype). No s4/int8 device arrays
        # — the quality gate uses this to measure quantization noise
        # without exercising the remote-TPU s4 layout machinery (whose
        # relayout device_put recurses when a program's chosen input
        # layout differs from the creation-pinned one).
        deq = (q.astype(np.float32) * scale)
        if grouped:
            deq = deq.reshape(*deq.shape[:-3], -1, deq.shape[-1])
        # fake_dtype: the ACTIVATION dtype to store the dequant in — needed
        # when ``w`` arrives as an fp32 intermediate (the AWQ fold) but the
        # pipeline's activations are bf16 (a f32 fake leaf would promote
        # the residual stream and break scan carry dtypes).
        return {"weight": jnp.asarray(deq, fake_dtype or w.dtype)}
    if bits == 4:
        return {"weight_int4": _to_device_int4(q), "scale": jnp.asarray(scale)}
    return {"weight_int8": jnp.asarray(q), "scale": jnp.asarray(scale)}


@functools.lru_cache(maxsize=None)
def _s4_format(shape: tuple):
    """The canonical packed device layout for an ``s4`` array of ``shape``,
    probed via AOT lowering of a trivial consumer. Needed because a plain
    jitted convert emits s4 with ``sub_byte_element_size_in_bits=0``
    (unpacked) while every consuming program expects the packed (=4)
    layout, and the relayout device_put recurses on the remote-TPU (axon)
    platform. One tiny compile per distinct weight shape, cached."""
    probe = jax.jit(lambda w: w.astype(jnp.bfloat16).sum())
    comp = probe.lower(jax.ShapeDtypeStruct(shape, jnp.int4)).compile()
    return comp.input_formats[0][0]


def _to_device_int4(q_int8) -> jnp.ndarray:
    """int8 host array (values in ±7) -> device ``s4`` array. The convert
    runs ON DEVICE under jit: the remote-TPU (axon) platform cannot
    device_put host s4 buffers (its shard_arg path recurses), and the
    output format is pinned to the packed s4 layout consumers expect
    (see ``_s4_format``)."""
    q = jnp.asarray(q_int8)
    try:
        fmt = _s4_format(tuple(q.shape))
        conv = jax.jit(lambda z: z.astype(jnp.int4), out_shardings=fmt)
    except Exception as e:  # noqa: BLE001 — CPU/backends without layout AOT
        if jax.default_backend() not in ("cpu",):
            # On axon/TPU the unpacked fallback layout is exactly the one
            # whose relayout device_put recurses forever — make the probe
            # failure loud instead of silently reinstating the hang.
            warnings.warn(
                f"s4 layout probe failed on backend {jax.default_backend()!r}"
                f" ({e!r}); falling back to the UNPACKED s4 layout, which is"
                " known to hang device_put on the axon remote-TPU platform.",
                stacklevel=2)
        conv = jax.jit(lambda z: z.astype(jnp.int4))
    return conv(q)


def widen_device_int4(v: jnp.ndarray) -> jnp.ndarray:
    """Device ``s4`` array -> device int8 array, with the widening
    program's INPUT format pinned (AOT, mirroring ``_s4_format``) to the
    packed s4 layout the array was created with. A plain jitted
    ``v.astype(int8)`` is a NEW consuming program whose input-layout
    assignment may differ from the creation-pinned layout — exactly the
    axon relayout device_put recursion (ADVICE r4: saving grouped-int4
    param caches hung over the remote-TPU tunnel)."""
    try:
        fmt = _s4_format(tuple(v.shape))
        conv = jax.jit(lambda z: z.astype(jnp.int8), in_shardings=fmt)
    except Exception:  # noqa: BLE001 — CPU/backends without layout AOT
        conv = jax.jit(lambda z: z.astype(jnp.int8))
    return conv(v)


def _pin_s4_layout(wq: jnp.ndarray) -> jnp.ndarray:
    """Constrain an s4 weight INSIDE the consuming program to its
    creation-pinned packed layout (VERDICT r4 #4). Without this, each new
    consumer (full-int4 decode step, the teacher-forced gate pass) runs
    its own layout assignment and may pick a different s4 layout than the
    one ``_to_device_int4`` pinned at creation — the resulting entry
    relayout is the device_put that recurses on the axon remote-TPU
    platform. Pinning at the single consumption point makes every
    program's entry layout agree by construction. Single-chip TPU only:
    the probed Format carries a single-device sharding, so sharded/spoofed
    configurations skip the constraint (their relayouts happen on
    backends where device_put works)."""
    if jax.default_backend() != "tpu" or jax.device_count() != 1:
        return wq
    try:
        from jax.experimental.layout import with_layout_constraint

        fmt = _s4_format(tuple(wq.shape))
        return with_layout_constraint(wq, fmt)
    except Exception:  # noqa: BLE001 — constraint is an optimization
        return wq


def proj_matmul(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """``x @ W`` for a bf16 leaf ``{"weight"}`` or a quantized leaf
    ``{"weight_int8"|"weight_int4", "scale"}``. Dequant is expressed so XLA
    fuses the int->activation-dtype convert into the dot's operand read.

    Grouped int4 (``W [G, group, out]``, scale ``[G, 1, out]``): the
    contraction splits into a G-batched dot (one dot_general, weight read
    stays packed s4) with fp32 accumulation, a per-(group, out) rescale,
    and a sum over groups — the scale never touches the weight operand, so
    no dequantized copy of W materializes in HBM."""
    wq = p.get("weight_int8", p.get("weight_int4"))
    if wq is not None:
        if wq.dtype == jnp.int4:
            wq = _pin_s4_layout(wq)
        if wq.ndim >= 3 and x.shape[-1] == wq.shape[-3] * wq.shape[-2]:
            G, gsz = wq.shape[-3], wq.shape[-2]
            xg = x.reshape(*x.shape[:-1], G, gsz)
            y = jnp.einsum("...gi,gio->...go", xg, wq.astype(x.dtype),
                           preferred_element_type=jnp.float32)
            y = y * jnp.squeeze(p["scale"], -2)
            return y.sum(axis=-2).astype(x.dtype)
        y = x @ wq.astype(x.dtype)
        return y * p["scale"].astype(y.dtype)
    return x @ p["weight"]


def awq_fold(layers: dict, fc2_energy, group_size: int = 128,
             alphas=(0.0, 0.25, 0.5, 0.75, 1.0)) -> dict:
    """Activation-aware (AWQ-style, Lin et al. 2023 — re-derived in numpy)
    EXACT-math rescale of the gated MLP ahead of int4 fc2 quantization.

    Key structural fact that makes the fold free: per-column channel
    scaling commutes with per-out-channel (and grouped per-out-channel)
    quantization. Scaling fc2's contraction row ``c`` by ``s_c`` and
    fc1's ``y``-half output column ``c`` by ``1/s_c`` is an exact-math
    identity on the block output (``mid_c -> mid_c / s_c``, SiLU gate
    half untouched), and fc1's own per-out-channel quant scales absorb
    the ``1/s_c`` exactly — so the fold costs fc1 NOTHING and lets fc2's
    15-level grid spend its dynamic range where the activations actually
    carry energy.

    ``fc2_energy``: ``[L, F]`` summed squares of the fc2 input per
    channel, captured from a REAL forward (models/backbone.py
    ``capture_fc2`` — the round-5 GPTQ negative result showed the
    iid-normal Monte-Carlo input proxy actively hurts; docs/KERNELS.md).

    Per layer, ``s = (rms / geomean(rms)) ** alpha`` with ``alpha``
    selected from ``alphas`` by the TRUE objective: the deployed output
    error ``sum_c E[mid_c^2] / s_c^2 * ||q(s_c W2_c) - s_c W2_c||^2``
    under the exact grouped-RTN+clip quantizer that ships
    (:func:`_rtn_groupquant`); ``alpha=0`` (no fold) is in the grid, so
    the search can only improve on plain RTN. Returns a new ``layers``
    tree with fp32 folded fc1/fc2 (both are re-quantized immediately
    after by the caller). Stacked ``[L, ...]`` transformer trees only."""
    import numpy as np

    assert "fc1" in layers and "weight" in layers["fc1"], "bf16 tree required"
    e = np.asarray(jax.device_get(fc2_energy), np.float64)  # [L, F]
    w1 = np.array(jax.device_get(layers["fc1"]["weight"]), np.float32)
    w2 = np.array(jax.device_get(layers["fc2"]["weight"]), np.float32)
    L, F, _ = w2.shape
    rms = np.sqrt(np.maximum(e, 1e-20))
    rms = rms / np.exp(np.mean(np.log(rms), axis=1, keepdims=True))  # gmean 1
    gsz = group_size if (F % group_size == 0 and F > group_size) else None
    for l in range(L):
        best_err, best_s = None, None
        for a in alphas:
            s = np.clip(rms[l] ** a, 1e-3, 1e3).astype(np.float32)  # [F]
            w2s = w2[l] * s[:, None]
            q, sc = _rtn_groupquant(w2s, 7.0, gsz, clip_search=True)
            dq = (q * sc).reshape(F, -1) if gsz else q * sc
            err = float((((dq - w2s) ** 2).sum(axis=1)
                         * (e[l] / s.astype(np.float64) ** 2)).sum())
            if best_err is None or err < best_err:
                best_err, best_s = err, s
        w2[l] *= best_s[:, None]
        w1[l, :, :F] /= best_s[None, :]
    out = dict(layers)
    out["fc1"] = {**layers["fc1"], "weight": w1}
    out["fc2"] = {**layers["fc2"], "weight": w2}
    return out


_QUANT_KEYS = ("in_proj", "out_proj", "fc1", "fc2")
_MLP_KEYS = ("fc1", "fc2")


def quantize_backbone_params(backbone_params: dict, bits: int = 8,
                             mlp_bits: int | None = None,
                             int4_group: int | None = 128,
                             fake: bool = False,
                             fc2_bits: int | None = None,
                             gptq: bool = False,
                             awq_energy=None) -> dict:
    """Quantize the transformer backbone's projection weights in place-like
    fashion (returns a new tree; norms/embeddings untouched). Works on the
    stacked-layer tree (models/backbone.init_transformer_backbone) and the
    hybrid per-layer list (models/mamba_backbone.init).

    ``bits`` applies to attention/Mamba projections; ``mlp_bits`` (default
    = ``bits``) to fc1/fc2. The MLP is ~83% of a flagship layer's weight
    bytes, so the mixed ``bits=8, mlp_bits=4`` mode captures most of int4's
    bandwidth win while keeping the residual-stream projections at int8.

    int4 projections use ``int4_group``-row sub-channel scale groups with
    per-column MSE clip search (VERDICT r3 #4) — ~24% lower weight RMS
    error than per-channel absmax on gaussian columns; contractions not
    divisible by the group size fall back to per-channel (still clipped).

    ``fc2_bits`` (default = MLP bits): fc2 gets its own width — the mixed
    fc1-int4/fc2-int8 point trades ~1/3 of int4's MLP bandwidth win for a
    large cut of its quantization noise. ``gptq``: int4 fc2 projections
    run GPTQ sequential error compensation (VERDICT r4 #2) against a
    Monte-Carlo input Hessian built per layer from that layer's own fc1 +
    SiLU gate (:func:`fc2_hessian_mc`) — a one-time host-side cost of
    ~1.7 min/layer at flagship scale (measured: 25 s Hessian MC + 74 s
    blocked sweep w/ clip search at d_ff=8192), ~45 min for the 26-layer
    stack. fc1's input is the LayerNorm
    output (near-isotropic ⇒ H ≈ I, where GPTQ provably reduces to RTN),
    so fc1 stays on the RTN+clip path."""
    act_dtype = [None]  # set when the AWQ fold re-stores fc1/fc2 as fp32

    def quantize_layer(layer: dict) -> dict:
        out = dict(layer)
        for k in _QUANT_KEYS:
            if k in layer and "weight" in layer[k]:
                if k == "fc2":
                    b = fc2_bits or mlp_bits or bits
                elif k in _MLP_KEYS:
                    b = mlp_bits or bits
                else:
                    b = bits
                h_fn = None
                if (gptq and k == "fc2" and b == 4 and "fc1" in layer
                        and "weight" in layer["fc1"]):
                    import numpy as np

                    w1_all = np.asarray(
                        jax.device_get(layer["fc1"]["weight"]), np.float32
                    )
                    h_fn = lambda idx, _w1=w1_all: fc2_hessian_mc(_w1[idx])
                out[k] = quantize_weight(
                    layer[k]["weight"], bits=b,
                    group_size=int4_group if b == 4 else None,
                    clip_search=b == 4, fake=fake, gptq_h=h_fn,
                    fake_dtype=act_dtype[0] if k in _MLP_KEYS else None)
        return out

    out = dict(backbone_params)
    layers = backbone_params["layers"]
    if isinstance(layers, (list, tuple)):
        out["layers"] = [quantize_layer(l) for l in layers]
    else:
        if awq_energy is not None and (fc2_bits or mlp_bits or bits) == 4:
            act_dtype[0] = layers["fc1"]["weight"].dtype
            layers = awq_fold(layers, awq_energy,
                              group_size=int4_group or 128)
        out["layers"] = quantize_layer(layers)
    return out


def quantize_zonos_params(params: dict, heads: bool = True,
                          embeddings: bool = False, bits: int = 8,
                          mlp_bits: int | None = None,
                          int4_group: int | None = 128,
                          fake: bool = False,
                          fc2_bits: int | None = None,
                          gptq: bool = False,
                          awq_energy=None) -> dict:
    """Full-model variant: backbone projections int8 (or int4/mixed via
    ``bits``/``mlp_bits``); conditioners stay bf16 (negligible bytes).
    Heads/embeddings never drop below int8 (logit-sensitive).

    ``heads`` (int8 phase 2): the 9 output heads are ``K x D x 1152`` —
    ~2% of the remaining per-step HBM traffic once the backbone is int8;
    per-out-channel scales apply to the fp32 logits after the einsum.

    ``embeddings`` (off by default): the decode step GATHERS K rows
    (~36 KB/step at flagship scale), so int8 tables buy memory footprint,
    not bandwidth — supported for completeness. A zero-size ``act_dtype``
    marker preserves the activation dtype the bf16 table produced."""
    out = dict(params)
    out["backbone"] = quantize_backbone_params(
        params["backbone"], bits=bits, mlp_bits=mlp_bits,
        int4_group=int4_group, fake=fake, fc2_bits=fc2_bits, gptq=gptq,
        awq_energy=awq_energy)
    if heads and "weight" in params["heads"]:
        out["heads"] = quantize_weight(params["heads"]["weight"], fake=fake)
    if embeddings and "weight" in params["embeddings"]:
        w = params["embeddings"]["weight"]  # [K, V, D]
        q = quantize_weight(w)  # scale [K, 1, D] (per-channel over V rows)
        q["act_dtype"] = jnp.zeros((), w.dtype)
        out["embeddings"] = q
    return out


def dequantize_weight(p: dict, dtype=jnp.bfloat16,
                      grouped: bool = False) -> jnp.ndarray:
    """Materialize the bf16 weight (tests / fallback paths). ``grouped``
    flattens a grouped-scale layout ``[..., G, group, out]`` back to
    ``[..., in, out]`` (shapes alone can't distinguish a stacked-layer
    ungrouped tensor from a grouped one — the caller knows)."""
    wq = p.get("weight_int8", p.get("weight_int4"))
    w = (wq.astype(jnp.float32) * p["scale"]).astype(dtype)
    if grouped:
        w = w.reshape(*w.shape[:-3], -1, w.shape[-1])
    return w


def quantize_kv(x: jnp.ndarray, dh_axis: int):
    """Symmetric per-(token, head) int8 for KV cache columns: absmax over
    the head_dim axis (traced, device-side — runs inside the decode
    program at stage-flush/prefill-splice time, amortized over the staged
    tokens). Returns ``(int8 values, f32 scales with dh_axis squeezed)``."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=dh_axis, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scale, axis=dh_axis)
