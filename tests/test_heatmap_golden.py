"""Heatmap golden parity vs the reference's assemble semantics (VERDICT r3
item 7): the full-resolution attention mask pipeline, the attention-row
extraction, and the documented ``attn_query='ref'`` (row pad+1) vs ``'cls'``
divergence quantified on a realistic bag."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transmil_deepgraft_tpu.visualize.heatmap import (
    assemble_heatmap,
    assemble_pixel_attention_map,
    attention_tile_scores,
)


def _fixture_slide(seed: int = 0, grid=(6, 8), n_tiles: int = 35):
    """Sparse tile layout + scores: coords (N,2) as (x, y)."""
    rng = np.random.default_rng(seed)
    h, w = grid
    all_cells = [(x, y) for y in range(h) for x in range(w)]
    idx = rng.choice(len(all_cells), size=n_tiles, replace=False)
    coords = np.asarray([all_cells[i] for i in idx], np.int64)
    scores = rng.random(n_tiles).astype(np.float32)
    return coords, scores


def test_pixel_map_matches_reference_oracle():
    """assemble_pixel_attention_map == the torch/scipy oracle implementing
    visualize_mil.py:368-436 (scatter -> F.interpolate bilinear -> re-norm ->
    gaussian sigma=15px), image-level allclose."""
    torch = pytest.importorskip("torch")
    from tests.torch_ref.heatmap_oracle import reference_attention_mask

    coords, scores = _fixture_slide()
    ours = assemble_pixel_attention_map(coords, scores, tile_px=224, sigma=15.0)
    ref = reference_attention_mask(coords, scores, tile_px=224, sigma=15.0)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)

    # the cheap grid-level dashboard variant stays structurally faithful:
    # its (blurred, upscaled) map correlates with the reference mask
    grid_map = assemble_heatmap(coords, scores, blur_sigma=0.5)
    up = np.kron(grid_map, np.ones((224, 224)))
    c = np.corrcoef(up.ravel(), ref.ravel())[0, 1]
    assert c > 0.9, c


def test_attention_row_chain_matches_reference_slicing():
    """attention_tile_scores (the O(n*m) on-device row, 'ref' query) equals
    the reference's slice of the FULL materialized torch attention matrix:
    cls_attention[0, :, pad+1, pad+1:pad+1+H] -> head mean -> min-max
    (visualize_mil.py:584-592), with converted weights on the same bag."""
    torch = pytest.importorskip("torch")
    from tests.torch_ref.heatmap_oracle import reference_row_scores
    from tests.torch_ref.mil_torch import TransMIL as TorchTransMIL
    from transmil_deepgraft_tpu.models import TransMIL
    from transmil_deepgraft_tpu.utils.torch_weights import convert_transmil_state_dict

    in_f, out_f, n = 192, 128, 180
    torch.manual_seed(0)
    tm = TorchTransMIL(2, in_f, out_f).eval()
    bag = np.random.default_rng(1).standard_normal((1, n, in_f)).astype(np.float32) * 0.5
    with torch.no_grad():
        _, (attn_full, padding) = tm(torch.from_numpy(bag), return_attn=True)
    ref_scores = reference_row_scores(attn_full.numpy(), int(padding), n)

    variables = convert_transmil_state_dict(tm.state_dict(), in_features=in_f)
    model = TransMIL(n_classes=2, in_features=in_f, out_features=out_f)
    _, attn = model.apply(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(bag),
        deterministic=True, return_attn=True,
    )
    ours = attention_tile_scores(attn)
    np.testing.assert_allclose(ours, ref_scores, atol=2e-4)


def test_ref_vs_cls_row_divergence_quantified():
    """The documented attn_query deviation, measured on a realistic bag
    (n=950 -> 31x31 square pad, nystrom front pad): 'ref' reproduces the
    reference's off-by-one row (pad+1, a DUPLICATED-TILE query token); 'cls'
    is the true cls-token row. Measured at random init AND after a short
    training run — both recorded in PARITY.md. Headline finding: the two
    rows are query-dependent and NOT interchangeable (corr ~0.08 at init),
    so heatmaps produced under 'ref' reproduce the reference's figures, not
    a generic attention map."""
    import optax

    from transmil_deepgraft_tpu.models import TransMIL

    rng = np.random.default_rng(3)
    n, in_f, out_f = 950, 128, 64
    bag = (rng.standard_normal((1, n, in_f)) * 0.5).astype(np.float32)
    # separable signal on the first 64 dims of 100 "tumor" tiles
    bag_pos = bag.copy()
    bag_pos[0, :100, :64] += 1.0

    def row_scores(q, params):
        model = TransMIL(n_classes=2, in_features=in_f, out_features=out_f, attn_query=q)
        _, attn = model.apply({"params": params}, jnp.asarray(bag_pos),
                              deterministic=True, return_attn=True)
        return attention_tile_scores(attn)

    model = TransMIL(n_classes=2, in_features=in_f, out_features=out_f)
    params0 = model.init({"params": jax.random.key(0)}, jnp.asarray(bag))["params"]

    # short training: positive bag -> 1, background bag -> 0
    tx = optax.adam(1e-4)
    opt_state = tx.init(params0)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, deterministic=True)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = params0
    for i in range(20):
        x = bag_pos if i % 2 == 0 else bag
        y = jnp.asarray([i % 2 == 0], jnp.int32)
        params, opt_state, _ = step(params, opt_state, jnp.asarray(x), y)

    report = {}
    for tag, p in (("init", params0), ("trained", params)):
        a, b = row_scores("ref", p), row_scores("cls", p)
        k = 50
        report[tag] = {
            "corr": float(np.corrcoef(a, b)[0, 1]),
            "top50_overlap": len(set(np.argsort(-a)[:k]) & set(np.argsort(-b)[:k])) / k,
            "max_abs": float(np.abs(a - b).max()),
        }
    print("ref-vs-cls divergence:", report)
    # the deviation is real at both stages: rows differ materially...
    assert report["init"]["max_abs"] > 0.1
    assert report["trained"]["max_abs"] > 1e-3
    # ...and training does not collapse them into the same row
    assert report["trained"]["corr"] < 0.999
