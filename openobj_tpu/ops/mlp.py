"""The per-object occupancy/color/CLIP field MLP, as pure functions.

Behavioural parity with the reference ``OccupancyMap``
(/root/reference/objnerf/model.py:16-103):

  trunk:  in_layer(emb1 -> h) -> mid1(h -> h) -> cat_layer(h+emb1 -> h)
          -> mid2(h -> h), all Linear+ReLU;
  heads:  out_alpha(h -> 1), raw * 10 (UniSurf convention, model.py:88);
          color_linear(h+emb2 -> h)+ReLU -> out_color(h -> 3) -> sigmoid;
          clip_linear(h+emb2 -> h)+ReLU -> out_clip(h -> clip_size), linear.

emb1/emb2 are the 87/42 split of the 129-d positional encoding
(reference trainer.py:20-21). Hidden size: 32 for objects, 128 for the
background (configs/Replica/room_0.json:53-54). Weights use Xavier-normal
init (model.py:4-6,43); biases start at zero.

Params are flat dicts of (weight [in, out], bias [out]) so a stack of N
objects is a leading axis on every leaf — `jax.vmap(mlp_apply)` turns the
whole object ensemble into one batched MXU matmul stack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LAYERS = (
    # name, (in expression), out expression — resolved in init
    "in_layer",
    "mid1",
    "cat_layer",
    "mid2",
    "out_alpha",
    "color_linear",
    "out_color",
    "clip_linear",
    "out_clip",
)

ALPHA_SCALE = 10.0  # UniSurf raw-density scale (reference model.py:88)


def _xavier_normal(key, fan_in: int, fan_out: int) -> jnp.ndarray:
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return std * jax.random.normal(key, (fan_in, fan_out), dtype=jnp.float32)


def _linear_init(key, fan_in: int, fan_out: int) -> dict:
    return {
        "w": _xavier_normal(key, fan_in, fan_out),
        "b": jnp.zeros((fan_out,), dtype=jnp.float32),
    }


def init_mlp_params(
    key: jax.Array,
    emb_size1: int = 87,
    emb_size2: int = 42,
    hidden: int = 32,
    clip_size: int = 512,
    do_color: bool = True,
    do_clip: bool = True,
) -> dict:
    keys = jax.random.split(key, len(_LAYERS))
    p = {
        "in_layer": _linear_init(keys[0], emb_size1, hidden),
        "mid1": _linear_init(keys[1], hidden, hidden),
        "cat_layer": _linear_init(keys[2], hidden + emb_size1, hidden),
        "mid2": _linear_init(keys[3], hidden, hidden),
        "out_alpha": _linear_init(keys[4], hidden, 1),
    }
    if do_color:
        p["color_linear"] = _linear_init(keys[5], hidden + emb_size2, hidden)
        p["out_color"] = _linear_init(keys[6], hidden, 3)
    if do_clip:
        p["clip_linear"] = _linear_init(keys[7], hidden + emb_size2, hidden)
        p["out_clip"] = _linear_init(keys[8], hidden, clip_size)
    return p


def _linear(p: dict, x: jnp.ndarray, cdt=None) -> jnp.ndarray:
    if cdt is not None:
        return jnp.dot(
            x.astype(cdt), p["w"].astype(cdt),
            preferred_element_type=jnp.float32,
        ) + p["b"]
    return x @ p["w"] + p["b"]


def _linear_relu(p: dict, x: jnp.ndarray, cdt=None) -> jnp.ndarray:
    return jax.nn.relu(_linear(p, x, cdt))


def _segments_linear_relu(p: dict, segs, cdt=None) -> jnp.ndarray:
    """relu(concat(segs) @ w + b) WITHOUT materializing the concat:
    row-partition w and sum the per-segment matmuls. For the skip/head
    concats this measured ~2x per-layer; for the PE (t, sins) pieces it is
    time-neutral (the narrow 3-wide matmul costs what the concat did) but
    avoids materializing the [..., 129] embedding."""
    w = p["w"]
    ofs, y = 0, None
    for s in segs:
        ws = w[ofs:ofs + s.shape[-1]]
        ofs += s.shape[-1]
        if cdt is not None:
            term = jnp.dot(
                s.astype(cdt), ws.astype(cdt),
                preferred_element_type=jnp.float32,
            )
        else:
            term = s @ ws
        y = term if y is None else y + term
    return jax.nn.relu(y + p["b"])


def merge_mlp_params(p: dict) -> dict:
    """Re-lay the param dict into the PRE-CONCATENATED blocks that
    ``mlp_apply_merged`` consumes, so the merged GEMMs pay zero per-step
    weight concats.

    ``gemm_impl="merged"`` measured SLOWER end-to-end (0.1393 vs 0.1232
    s/frame, docs/PERFORMANCE.md) because the merged weight blocks were
    rebuilt by concat inside every optimizer step (weights change each
    step) and their grad splits added back the fusions the merge saved.
    Stored pre-merged, the rebuild and the grad splits vanish: the merged
    block IS the parameter. AdamW is elementwise and concat commutes with
    every elementwise update, so the training MATH is identical; executed
    outputs match to f32 roundoff rather than bitwise, because XLA may
    re-split a concat-fed GEMM in the reference layout (measured ~5e-6
    rel loss delta after 10 steps — tests/test_ops_core.py).

    Leaves use ellipsis indexing so the same function re-lays a single
    model [in, out] or a stacked one [O, in, out] — and, because it is
    pure slicing/concat, the optimizer's mu/nu trees convert with the
    same function. ``unmerge_mlp_params`` is the exact inverse.

    Layout (h = hidden):
      e1w     [e1, 2h]    in_layer.w | cat_layer.w e-rows
      cat_h   {w [h, h], b [h]}      cat_layer's h-rows + bias
      e2w     [e2, 2h]    color_linear | clip_linear e-rows
      h3w     [h, 1+2h]   out_alpha | color_linear h-rows | clip h-rows
      in_b / alpha_b / color_b / clip_b   the split-off biases
      mid1 / mid2 / out_color / out_clip  unchanged
    """
    h = p["mid1"]["w"].shape[-1]
    if "color_linear" not in p or "clip_linear" not in p:
        raise NotImplementedError(
            "merged param layout requires both color and clip heads "
            "(the training tree always carries both — trainer.py "
            "init_train_state)"
        )
    return {
        "e1w": jnp.concatenate(
            [p["in_layer"]["w"], p["cat_layer"]["w"][..., h:, :]], axis=-1
        ),
        "in_b": p["in_layer"]["b"],
        "mid1": p["mid1"],
        "cat_h": {"w": p["cat_layer"]["w"][..., :h, :],
                  "b": p["cat_layer"]["b"]},
        "mid2": p["mid2"],
        "e2w": jnp.concatenate(
            [p["color_linear"]["w"][..., h:, :],
             p["clip_linear"]["w"][..., h:, :]], axis=-1
        ),
        "h3w": jnp.concatenate(
            [p["out_alpha"]["w"], p["color_linear"]["w"][..., :h, :],
             p["clip_linear"]["w"][..., :h, :]], axis=-1
        ),
        "alpha_b": p["out_alpha"]["b"],
        "color_b": p["color_linear"]["b"],
        "clip_b": p["clip_linear"]["b"],
        "out_color": p["out_color"],
        "out_clip": p["out_clip"],
    }


def unmerge_mlp_params(m: dict) -> dict:
    """Exact inverse of ``merge_mlp_params`` (reference layout back)."""
    h = m["mid1"]["w"].shape[-1]
    return {
        "in_layer": {"w": m["e1w"][..., :h], "b": m["in_b"]},
        "mid1": m["mid1"],
        "cat_layer": {
            "w": jnp.concatenate(
                [m["cat_h"]["w"], m["e1w"][..., h:]], axis=-2
            ),
            "b": m["cat_h"]["b"],
        },
        "mid2": m["mid2"],
        "out_alpha": {"w": m["h3w"][..., :1], "b": m["alpha_b"]},
        "color_linear": {
            "w": jnp.concatenate(
                [m["h3w"][..., 1:1 + h], m["e2w"][..., :h]], axis=-2
            ),
            "b": m["color_b"],
        },
        "out_color": m["out_color"],
        "clip_linear": {
            "w": jnp.concatenate(
                [m["h3w"][..., 1 + h:], m["e2w"][..., h:]], axis=-2
            ),
            "b": m["clip_b"],
        },
        "out_clip": m["out_clip"],
    }


def _merged_mm(x, w, b=None, cdt=None):
    if cdt is not None:
        y = jnp.dot(x.astype(cdt), w.astype(cdt),
                    preferred_element_type=jnp.float32)
    else:
        y = x @ w
    return y if b is None else y + b


def mlp_apply_merged(
    params: dict,
    emb,
    emb_size1: int = 87,
    do_alpha: bool = True,
    do_color: bool = True,
    do_clip: bool = True,
    do_cat: bool = True,
    clip_hidden_only: bool = False,
    compute_dtype: str = "f32",
):
    """mlp_apply with column-merged GEMMs (same math, fewer launches).

    The step program is ensemble-GEMM-throughput-bound (the O-batched,
    32-wide matmuls run at ~7 TFLOPS f32 — 7% of peak; measurements in
    scripts/bench_gemm_variants.py), and the segmented form issues ~12
    forward GEMMs. Sibling GEMMs that share an INPUT operand concatenate
    along the OUTPUT axis into one wider launch (output columns are
    independent, so each column's accumulation is bit-identical to the
    separate matmul):

      e1 -> [in_layer | cat_layer's e-rows]        (87 x 2h)
      e2 -> [color_linear's | clip_linear's e-rows] (42 x 2h)
      h3 -> [out_alpha | color_linear's h-rows | clip_linear's h-rows]
                                                    (h x 1+2h)

    7 forward launches instead of ~12, each 2-4x wider; the backward
    merges come free (the transpose of a merged GEMM is merged). The
    only non-bit-exact deviation vs the segmented path: e1 is
    materialized by concat (t|sins), so the in/cat matmuls accumulate
    [t|s]@[Wt;Ws] in one contraction instead of t@Wt + s@Ws (f32
    roundoff-level reorder).

    ``params`` may be either the reference layout (blocks concatenated
    here, per call — inside a scan that is per STEP, which is what made
    plain merged mode slower end-to-end) or the pre-merged layout from
    ``merge_mlp_params`` (zero concats). Pre-merged additionally row-
    partitions the e1 GEMM when emb arrives as (t, sins) — t@Wt + s@Ws
    instead of concat(t,s)@W — one more f32 accumulation reorder
    (~3e-6 rel, tests/test_ops_core.py); every other pre-merged GEMM is
    a contiguous slice of the stored block, i.e. identical width and
    accumulation order."""
    cdt = jnp.bfloat16 if compute_dtype == "bf16" else None
    h = params["mid1"]["w"].shape[-1]
    pre = "e1w" in params
    e1_segs = None
    if isinstance(emb, tuple):
        t, sins = emb
        n_raw = t.shape[-1]
        if pre:
            # pre-merged weights: consume the PE pieces by ROW-partitioning
            # the column-merged block (t@W[:3] + sins@W[3:]) — the [.., 87]
            # activation concat is a per-step HBM materialization the
            # segmented path never pays, and here we get both: no concat
            # AND the column-merged launch count
            e1_segs = [t, sins[..., : emb_size1 - n_raw]]
            e1 = None
        else:
            e1 = jnp.concatenate([t, sins[..., : emb_size1 - n_raw]], axis=-1)
        e2 = sins[..., emb_size1 - n_raw:]
    else:
        e1, e2 = emb[..., :emb_size1], emb[..., emb_size1:]

    if pre:
        in_b = params["in_b"]
        cat_w_h, cat_b = params["cat_h"]["w"], params["cat_h"]["b"]
        alpha_b = params["alpha_b"]
        color_b, clip_b = params["color_b"], params["clip_b"]
    else:
        in_b = params["in_layer"]["b"]
        cat_w_h = params["cat_layer"]["w"][:h]
        cat_b = params["cat_layer"]["b"]
        alpha_b = params["out_alpha"]["b"]
        color_b = params.get("color_linear", {}).get("b")
        clip_b = params.get("clip_linear", {}).get("b")

    if do_cat:
        w1 = params["e1w"] if pre else jnp.concatenate(
            [params["in_layer"]["w"], params["cat_layer"]["w"][h:]], axis=-1
        )
        if e1_segs is not None:
            ofs, y1 = 0, None
            for s in e1_segs:
                term = _merged_mm(s, w1[..., ofs:ofs + s.shape[-1], :], cdt=cdt)
                ofs += s.shape[-1]
                y1 = term if y1 is None else y1 + term
        else:
            y1 = _merged_mm(e1, w1, cdt=cdt)
        h1 = jax.nn.relu(y1[..., :h] + in_b)
        cat_e = y1[..., h:]
    else:
        w_in = params["e1w"][..., :h] if pre else params["in_layer"]["w"]
        if e1_segs is not None:
            ofs, y1 = 0, None
            for s in e1_segs:
                term = _merged_mm(
                    s, w_in[..., ofs:ofs + s.shape[-1], :], cdt=cdt)
                ofs += s.shape[-1]
                y1 = term if y1 is None else y1 + term
            h1 = jax.nn.relu(y1 + in_b)
        else:
            h1 = jax.nn.relu(_merged_mm(e1, w_in, in_b, cdt))
    h2 = jax.nn.relu(
        _merged_mm(h1, params["mid1"]["w"], params["mid1"]["b"], cdt))
    if do_cat:
        hc = jax.nn.relu(_merged_mm(h2, cat_w_h, cdt=cdt) + cat_e + cat_b)
    else:
        hc = h2
    h3 = jax.nn.relu(
        _merged_mm(hc, params["mid2"]["w"], params["mid2"]["b"], cdt))

    use_color = do_color and "out_color" in params
    use_clip = do_clip and "out_clip" in params

    # e2 consumers (no bias here; added at the relu)
    col_e = clip_e = None
    if pre:
        # slice the stored block to exactly the columns the reference-
        # layout path would have concatenated: same GEMM width -> same
        # accumulation order -> bit-equal outputs (a wider GEMM is NOT
        # bit-stable vs a narrower one), and a contiguous slice of a leaf
        # costs no concat (backward is a zero-pad)
        if use_color or use_clip:
            lo2 = 0 if use_color else h
            hi2 = 2 * h if use_clip else h
            y5 = _merged_mm(e2, params["e2w"][..., lo2:hi2], cdt=cdt)
            if use_color:
                col_e = y5[..., :h]
            if use_clip:
                clip_e = y5[..., (h if use_color else 0):]
    elif use_color and use_clip:
        y5 = _merged_mm(
            e2, jnp.concatenate([params["color_linear"]["w"][h:],
                                 params["clip_linear"]["w"][h:]], axis=-1),
            cdt=cdt)
        col_e, clip_e = y5[..., :h], y5[..., h:]
    elif use_color:
        col_e = _merged_mm(e2, params["color_linear"]["w"][h:], cdt=cdt)
    elif use_clip:
        clip_e = _merged_mm(e2, params["clip_linear"]["w"][h:], cdt=cdt)

    # h3 consumers (block columns: alpha [0:1], color [1:1+h], clip [1+h:])
    alpha = color = clip = None
    if pre:
        lo = 0 if do_alpha else (1 if use_color else 1 + h)
        hi = (1 + 2 * h) if use_clip else ((1 + h) if use_color else 1)
        if do_alpha and use_clip and not use_color:
            lo, hi = 0, 1 + 2 * h   # non-contiguous ask: take the full block
        if hi > lo:
            y6 = _merged_mm(h3, params["h3w"][..., lo:hi], cdt=cdt)
            if do_alpha:
                alpha = (y6[..., :1] + alpha_b) * ALPHA_SCALE
            if use_color:
                hcol = jax.nn.relu(
                    y6[..., 1 - lo:1 - lo + h] + col_e + color_b)
                color = jax.nn.sigmoid(
                    _merged_mm(hcol, params["out_color"]["w"],
                               params["out_color"]["b"], cdt))
            if use_clip:
                hf = jax.nn.relu(
                    y6[..., 1 + h - lo:1 + 2 * h - lo] + clip_e + clip_b)
                clip = hf if clip_hidden_only else _merged_mm(
                    hf, params["out_clip"]["w"], params["out_clip"]["b"], cdt)
        return alpha, color, clip

    blocks = []
    if do_alpha:
        blocks.append(params["out_alpha"]["w"])
    if use_color:
        blocks.append(params["color_linear"]["w"][:h])
    if use_clip:
        blocks.append(params["clip_linear"]["w"][:h])
    if blocks:
        y6 = _merged_mm(h3, jnp.concatenate(blocks, axis=-1), cdt=cdt)
        ofs = 0
        if do_alpha:
            alpha = (y6[..., :1] + alpha_b) * ALPHA_SCALE
            ofs = 1
        if use_color:
            hcol = jax.nn.relu(y6[..., ofs:ofs + h] + col_e + color_b)
            color = jax.nn.sigmoid(
                _merged_mm(hcol, params["out_color"]["w"],
                           params["out_color"]["b"], cdt))
            ofs += h
        if use_clip:
            hf = jax.nn.relu(y6[..., ofs:ofs + h] + clip_e + clip_b)
            clip = hf if clip_hidden_only else _merged_mm(
                hf, params["out_clip"]["w"], params["out_clip"]["b"], cdt)
    return alpha, color, clip


def mlp_apply(
    params: dict,
    emb: jnp.ndarray,
    emb_size1: int = 87,
    do_alpha: bool = True,
    do_color: bool = True,
    do_clip: bool = True,
    do_cat: bool = True,
    clip_hidden_only: bool = False,
    compute_dtype: str = "f32",
    gemm_impl: str = "segmented",
):
    """Evaluate the field at embedded points.

    emb: [..., emb_size1 + emb_size2]
    Returns (alpha [..., 1] | None, color [..., 3] | None,
             clip [..., clip_size] | None).

    compute_dtype "bf16": matmul operands cast to bfloat16 with f32 MXU
    accumulation (params stay f32 masters; the cast transpose keeps grads
    f32). PE/loss math stays f32 — this only touches the MLP matmuls.

    clip_hidden_only: return the pre-projection clip hidden [..., h] instead
    of the projected [..., clip_size] feature. Because the final clip head is
    LINEAR, ray compositing commutes with it:
        render(w, hidden @ W + b) == render(w, hidden) @ W + sum(w) * b
    so callers that only need the *rendered* feature composite the h-wide
    hidden first and apply ``clip_project`` once per ray — cutting the
    dominant h->512 matmul by the samples-per-ray factor (10-150x) and never
    materializing the [rays, samples, 512] tensor in HBM.

    ``emb`` may also be the UNCONCATENATED PE pieces ``(t, sins)`` (see
    positional_encoding(concat=False)) — every layer then consumes the
    pieces via row-partitioned matmuls, so the [..., 129] embedding tensor
    is never materialized at all.

    gemm_impl "merged" routes to mlp_apply_merged (column-merged sibling
    GEMMs — fewer, wider launches; see its docstring for the measured
    rationale).
    """
    if gemm_impl == "merged" or "e1w" in params:
        # a pre-merged layout (merge_mlp_params) only evaluates on the
        # merged path — the segmented path's keys don't exist in it
        return mlp_apply_merged(
            params, emb, emb_size1=emb_size1, do_alpha=do_alpha,
            do_color=do_color, do_clip=do_clip, do_cat=do_cat,
            clip_hidden_only=clip_hidden_only, compute_dtype=compute_dtype,
        )
    cdt = jnp.bfloat16 if compute_dtype == "bf16" else None
    if isinstance(emb, tuple):
        t, sins = emb
        n_raw = t.shape[-1]
        e1_segs = [t, sins[..., : emb_size1 - n_raw]]
        e2_segs = [sins[..., emb_size1 - n_raw:]]
    else:
        e1_segs = [emb[..., :emb_size1]]
        e2_segs = [emb[..., emb_size1:]]

    # every concat (skip/head AND the PE pieces) is a row-partitioned matmul
    # sum — measured ~2x faster fwd+bwd at the room_0 shapes (concats and
    # their transpose-splits dominate these tiny-matmul layers)
    h = _segments_linear_relu(params["in_layer"], e1_segs, cdt)
    h = _linear_relu(params["mid1"], h, cdt)
    if do_cat:
        h = _segments_linear_relu(params["cat_layer"], [h] + e1_segs, cdt)
    h = _linear_relu(params["mid2"], h, cdt)

    alpha = None
    if do_alpha:
        alpha = _linear(params["out_alpha"], h, cdt) * ALPHA_SCALE

    color = None
    if do_color and "out_color" in params:
        hc = _segments_linear_relu(params["color_linear"], [h] + e2_segs, cdt)
        color = jax.nn.sigmoid(_linear(params["out_color"], hc, cdt))

    clip = None
    if do_clip and "out_clip" in params:
        hf = _segments_linear_relu(params["clip_linear"], [h] + e2_segs, cdt)
        clip = hf if clip_hidden_only else _linear(params["out_clip"], hf, cdt)

    return alpha, color, clip


def clip_project(
    params: dict, hidden: jnp.ndarray, opacity: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Apply the final clip head to (possibly ray-composited) hidden features.

    params: the mlp param dict (uses params["out_clip"]); w may carry a
    leading stacked-object axis [O, h, C] with hidden [O, ..., h].
    opacity: sum of termination weights — pass it when ``hidden`` is a
    composited ray feature so the bias is weighted by sum(w) (see
    ``mlp_apply`` docstring for the exactness argument).
    """
    w, b = params["out_clip"]["w"], params["out_clip"]["b"]
    if w.ndim == 3:  # stacked objects: hidden [O, ..., h] @ w [O, h, C]
        y = jnp.einsum("o...h,ohc->o...c", hidden, w)
        b = b[(slice(None),) + (None,) * (y.ndim - 2)]
    else:
        y = hidden @ w
    if opacity is not None:
        return y + opacity[..., None] * b
    return y + b


def param_count(params: dict) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
