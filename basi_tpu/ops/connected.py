"""TPU-native connected components over binary saliency maps.

SURVEY §2.8 candidate (c): the reference may derive instances as connected
components of a boundary-aware saliency map. CPU union-find is hostile to
XLA, so this is the classic iterative label-propagation formulation — fully
static shapes, one ``lax.while_loop`` of 3x3 min-pool steps:

  1. seed every foreground pixel with a unique label (its linear index)
  2. repeatedly take the min label over the 4/8-neighborhood (masked to
     foreground) until no label changes (while_loop with a fixed cap)
  3. labels converge to the component's minimum linear index

Convergence needs O(component diameter) iterations; at /4 resolution
(128 x 128) the cap of H+W steps is exact for any shape, and the early-exit
predicate stops as soon as labels are stable (typically ~tens of steps).

``extract_instances`` then packs the K largest components into the fixed
instance-slot contract used everywhere else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.int32(2 ** 30)


def label_components(binary: jnp.ndarray, connectivity: int = 4,
                     max_iters: int | None = None) -> jnp.ndarray:
    """Label connected components of a binary mask (H, W) -> int32 labels.

    Background pixels get -1; each component's label is the minimum linear
    index it contains (deterministic, order-free).
    """
    h, w = binary.shape
    fg = binary > 0.5
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    labels = jnp.where(fg, idx, _INF)
    cap = max_iters if max_iters is not None else h + w

    def min_pool(x):
        # min over the neighborhood as explicit shifted mins (the
        # ``shifts`` list IS the connectivity definition: 4 axis
        # neighbors, +4 diagonals for 8-connectivity).
        big = jnp.full_like(x, _INF)
        out = x
        shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 8:
            shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        for dy, dx in shifts:
            shifted = jnp.roll(x, (dy, dx), axis=(0, 1))
            # zero-pad semantics: rolled-in rows/cols are invalid
            if dy == -1:
                shifted = shifted.at[-1, :].set(_INF)
            elif dy == 1:
                shifted = shifted.at[0, :].set(_INF)
            if dx == -1:
                shifted = shifted.at[:, -1].set(_INF)
            elif dx == 1:
                shifted = shifted.at[:, 0].set(_INF)
            out = jnp.minimum(out, shifted)
        return jnp.where(fg, out, big)

    def compress(x):
        # Pointer jumping: a pixel's label is a linear index; hop to THAT
        # pixel's label (path compression). Turns worst-case convergence
        # from O(path length) into O(log path length) when alternated with
        # the neighborhood min — a serpentine component converges in ~10
        # rounds instead of ~500.
        safe = jnp.clip(x.reshape(-1), 0, h * w - 1)
        hopped = x.reshape(-1)[safe].reshape(h, w)
        hopped = jnp.where(x < _INF, jnp.minimum(x, hopped), x)
        return jnp.where(fg, hopped, jnp.full_like(x, _INF))

    def cond(state):
        labels, prev_changed, it = state
        return jnp.logical_and(prev_changed, it < cap)

    def body(state):
        labels, _, it = state
        new = compress(min_pool(labels))
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(fg, labels, -1)


def _erode(binary: jnp.ndarray, steps: int) -> jnp.ndarray:
    """Morphological 3x3 erosion (zero-padded: the image border erodes),
    ``steps`` times. binary: (H, W) bool."""
    x = binary
    for _ in range(steps):
        p = jnp.pad(x, 1, constant_values=False)
        out = x
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                out = out & p[1 + dy:p.shape[0] - 1 + dy,
                              1 + dx:p.shape[1] - 1 + dx]
        x = out
    return x


def _grow_labels(labels: jnp.ndarray, fg: jnp.ndarray,
                 connectivity: int = 4,
                 max_iters: int | None = None) -> jnp.ndarray:
    """Frozen-front label growth (marker 'watershed' without heights):
    assigned pixels KEEP their label; unassigned foreground pixels adopt
    the min assigned neighbor label, one ring per iteration, so two seed
    fronts meeting inside a merged blob split it at the meeting line
    (ties -> min label) instead of flooding to one min like
    label_components' global min-propagation would."""
    h, w = labels.shape
    cap = max_iters if max_iters is not None else h + w
    shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 8:
        shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]

    def step(x):
        nb = jnp.full_like(x, _INF)
        for dy, dx in shifts:
            shifted = jnp.roll(x, (dy, dx), axis=(0, 1))
            if dy == -1:
                shifted = shifted.at[-1, :].set(_INF)
            elif dy == 1:
                shifted = shifted.at[0, :].set(_INF)
            if dx == -1:
                shifted = shifted.at[:, -1].set(_INF)
            elif dx == 1:
                shifted = shifted.at[:, 0].set(_INF)
            nb = jnp.minimum(nb, shifted)
        return jnp.where((x < _INF) | ~fg, x, nb)

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < cap)

    def body(state):
        x, _, it = state
        new = step(x)
        return new, jnp.any(new != x), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    return labels


def split_labels(binary: jnp.ndarray, erode_steps: int = 2,
                 connectivity: int = 4) -> jnp.ndarray:
    """Boundary-aware component labels (VERDICT r4 item 4): erode ->
    label the cores -> grow the labels back over the original mask with
    frozen fronts. Touching instances whose union necks down separate at
    the erosion seam; the growth re-dilates each core to the full mask.
    Foreground components that vanish entirely under erosion (small
    instances) are rescued by a plain labeling pass over the unreached
    remainder — their min-linear-index labels cannot collide with seed
    labels (disjoint pixel sets, labels are member indices).
    Returns (H, W) int32 labels, -1 = background."""
    h, w = binary.shape
    fg = binary
    seeds = _erode(fg, erode_steps)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    # Label the seed CORES first (one core blob = one seed label), then
    # grow. Seeding raw linear indices would grow h*w fronts and split
    # every component into Voronoi cells of its own pixels.
    core = label_components(seeds.astype(jnp.float32),
                            connectivity=connectivity)
    labels = jnp.where(core >= 0, core, _INF)
    labels = _grow_labels(labels, fg, connectivity=connectivity,
                          max_iters=4 * erode_steps + 8)
    unreached = fg & (labels >= _INF)
    rest = label_components(unreached.astype(jnp.float32),
                            connectivity=connectivity)
    labels = jnp.where(labels < _INF, labels, jnp.where(rest >= 0, rest, -1))
    del idx
    return jnp.where(fg, labels, -1)


def split_labels_edt(binary: jnp.ndarray, connectivity: int = 4,
                     min_seed_dist: float = 2.0) -> jnp.ndarray:
    """Watershed-style splitting: seeds at the maxima of the exact
    Euclidean distance transform, grown back with frozen fronts.

    Erosion (split_labels) only separates unions that NECK DOWN; two
    overlapping convex instances (the occlusion case the synthetic scenes
    are full of) form a SMOOTH union it cannot split. Their distance
    transform, however, has one maximum per instance body, and growing
    labels from those maxima partitions the union at the saddle — the
    classic EDT-watershed nuclei split, built from the same exact EDT the
    weighted-F metric uses (evals/saliency._edt_payload).

    Distance values are rounded to integers before the plateau test:
    exact squared distances are integer sums of two squares, and their
    ±1-pixel discretization dips would otherwise break one instance's
    ridge plateau into several maxima components (oversplit). Maxima
    below ``min_seed_dist`` (thin structures, boundary noise) are not
    seeds; foreground never reached by the growth (seedless thin
    components) is rescued by a residual labeling pass.
    """
    from basi_tpu.evals.saliency import _edt_payload

    h, w = binary.shape
    fg = binary
    # 1-pixel background ring: edge-touching blobs get a finite distance
    # (the frame boundary IS a boundary).
    bg = jnp.pad(~fg, 1, constant_values=True).astype(jnp.float32)
    d2, _ = _edt_payload(bg, jnp.zeros_like(bg))
    dist = jnp.sqrt(d2[1:-1, 1:-1]) * fg
    # Seeds = h-maxima: points whose peak PROMINENCE exceeds ``h_depth``
    # (a plain 3x3 plateau test also fires on every saddle/ridge point —
    # measured: it fragments one union into ~9 seeds). Morphological
    # reconstruction of (dist - h) under dist by geodesic 3x3 dilation:
    # rec converges to the h-maxima transform, and dist - rec >= h only
    # inside peaks that stand at least h above every escape path.
    h_depth = 1.0

    def _cond(state):
        rec, changed, it = state
        return jnp.logical_and(changed, it < h + w)

    def _body(state):
        rec, _, it = state
        new = jnp.minimum(-_erode_like_max(-rec), dist)
        return new, jnp.any(new != rec), it + 1

    rec, _, _ = jax.lax.while_loop(
        _cond, _body, (dist - h_depth, jnp.bool_(True), jnp.int32(0)))
    seeds = fg & (dist - rec >= h_depth) & (dist >= min_seed_dist)
    # Bridge discretization dips along one instance's ridge: dilate the
    # seed set 2 px (within fg) before labeling, so fragments of ONE
    # ridge merge while distinct bodies (saddle-separated, > 5 px apart)
    # stay separate cores.
    seeds = _dilate(seeds, 2) & fg
    core = label_components(seeds.astype(jnp.float32),
                            connectivity=connectivity)
    labels = jnp.where(core >= 0, core, _INF)
    labels = _grow_labels(labels, fg, connectivity=connectivity)
    unreached = fg & (labels >= _INF)
    rest = label_components(unreached.astype(jnp.float32),
                            connectivity=connectivity)
    labels = jnp.where(labels < _INF, labels, jnp.where(rest >= 0, rest, -1))
    return jnp.where(fg, labels, -1)


def _erode_like_max(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 min filter on floats (edge-replicated): used negated as the
    3x3 max (geodesic dilation step of the h-maxima reconstruction)."""
    p = jnp.pad(x, 1, mode="edge")
    out = x
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out = jnp.minimum(out, p[1 + dy:p.shape[0] - 1 + dy,
                                     1 + dx:p.shape[1] - 1 + dx])
    return out


def _dilate(binary: jnp.ndarray, steps: int) -> jnp.ndarray:
    """Morphological 3x3 dilation, ``steps`` times. binary: (H, W) bool."""
    x = binary
    for _ in range(steps):
        p = jnp.pad(x, 1, constant_values=False)
        out = x
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                out = out | p[1 + dy:p.shape[0] - 1 + dy,
                              1 + dx:p.shape[1] - 1 + dx]
        x = out
    return x


@functools.partial(jax.jit, static_argnames=("num_slots", "connectivity",
                                             "split", "erode_steps"))
def extract_instances(saliency_prob: jnp.ndarray, num_slots: int = 20,
                      threshold: float = 0.5, min_area: int = 16,
                      connectivity: int = 4, split: str = "none",
                      erode_steps: int = 2):
    """Connected-component instance extraction (mechanism (c)).

    saliency_prob: (H, W) probabilities. Returns (masks (K, H, W) 0/1,
    scores (K,)) where score = mean saliency inside the component and
    components are ordered by area. Empty slots are zero.

    ``split="erode"``: boundary-aware splitting (split_labels) — erode by
    ``erode_steps``, label the cores, re-dilate with frozen fronts so
    merged touching instances separate at the erosion seam.
    ``split="edt"``: EDT-watershed splitting (split_labels_edt) — also
    separates SMOOTH occlusion unions erosion cannot.
    """
    h, w = saliency_prob.shape
    binary = saliency_prob > threshold
    if split == "erode":
        labels = split_labels(binary, erode_steps=erode_steps,
                              connectivity=connectivity)
    elif split == "edt":
        labels = split_labels_edt(binary, connectivity=connectivity,
                                  min_seed_dist=float(max(erode_steps, 1)))
    elif split == "none":
        labels = label_components(binary.astype(jnp.float32),
                                  connectivity=connectivity)
    else:
        raise ValueError(
            f"split={split!r} (expected 'none', 'erode' or 'edt')")

    flat = labels.reshape(-1)
    probs = saliency_prob.reshape(-1).astype(jnp.float32)
    valid = flat >= 0
    # Root-pixel trick: a component's label IS one of its pixel indices, so
    # scatter-add areas/saliency onto that root pixel's slot — no dynamic
    # number of components anywhere.
    roots = jnp.where(valid, flat, 0)
    ones = valid.astype(jnp.float32)
    area = jnp.zeros((h * w,), jnp.float32).at[roots].add(ones)
    sal_sum = jnp.zeros((h * w,), jnp.float32).at[roots].add(probs * ones)
    is_root = jnp.zeros((h * w,), jnp.bool_).at[roots].max(valid)
    area = jnp.where(is_root, area, 0.0)
    area = jnp.where(area >= min_area, area, 0.0)

    _, top_roots = jax.lax.top_k(area, num_slots)
    top_area = area[top_roots]
    scores = jnp.where(
        top_area > 0, sal_sum[top_roots] / jnp.maximum(top_area, 1.0), 0.0)
    masks = (flat[None, :] == top_roots[:, None]) & (top_area[:, None] > 0)
    return masks.reshape(num_slots, h, w).astype(jnp.float32), scores
