"""Host JPEG decode ceiling (VERDICT r4 item 6).

The honest disk->prediction path is host-decode-bound below ~20 cores at the
r4-measured 761 tiles/s/core (224px sources, full iDCT). This tool measures
every available lever, per core (n_threads=1 — the loader scales per-core-flat
and the dev VM has 1 vCPU):

* native loader, full decode (the r4 baseline),
* native loader, scaled-DCT decode (libjpeg ``scale_num/denom``: oversized
  sources decode at 1/2-1/8 scale, then a < 2x bilinear finishes the job),
* PIL full decode + resize (the bundled libjpeg-turbo SIMD build),
* PIL ``draft`` mode (PIL's own scaled-DCT entry point), for cross-checking
  the native numbers against an independent implementation.

Sources sweep 224/256/448/896 px -> 224 target: WSI extraction commonly tiles
at 256-512 px, where scaled decode applies; 224-source rows are the headline
fixture's regime, where it cannot (and the tool shows that honestly).

Also reports the pixel deviation of each scaled path vs full decode on the
same tiles (mean/max |d| in u8 levels) so the speed/fidelity trade is measured
in one place.

  python tools/bench_decode.py [--tiles 512] [--sizes 224,256,448,896]

Prints one JSON row per (source, method); reference match:
``code/datasets/dali_dataloader.py:26-255`` (the reference's answer was
hardware decode; this is the measured software ceiling).
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_tiles(td: Path, src: int, n_distinct: int, rng) -> list[Path]:
    """Tissue-like smooth-blob JPEGs (q80): gaussian-filtered low-freq noise —
    pure uniform noise would be adversarial for any DCT-domain shortcut and is
    not what H&E tiles look like."""
    from PIL import Image
    from scipy.ndimage import gaussian_filter, zoom

    paths = []
    for i in range(n_distinct):
        x = rng.standard_normal((src // 8, src // 8, 3))
        img = zoom(x, (8, 8, 1), order=1)
        img = gaussian_filter(img, (3, 3, 0))
        img = (img - img.min()) / (np.ptp(img) + 1e-9) * 255
        p = td / f"t{src}_{i}.jpg"
        Image.fromarray(img.astype(np.uint8)).save(p, quality=80)
        paths.append(p)
    return paths


def pil_decode(paths, target: int, draft: bool) -> np.ndarray:
    from PIL import Image

    out = np.empty((len(paths), target, target, 3), np.uint8)
    for i, p in enumerate(paths):
        with Image.open(p) as im:
            if draft:
                im.draft("RGB", (target, target))
            im = im.convert("RGB").resize((target, target), Image.BILINEAR)
            out[i] = np.asarray(im)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=512,
                    help="decodes per measurement (cycled over 64 distinct)")
    ap.add_argument("--distinct", type=int, default=64)
    ap.add_argument("--sizes", default="224,256,448,896")
    ap.add_argument("--target", type=int, default=224)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from transmil_deepgraft_tpu.data import native_tiles as nt

    assert nt.available(), "native tile loader unavailable"
    rng = np.random.default_rng(0)
    rows = []
    with tempfile.TemporaryDirectory() as tds:
        td = Path(tds)
        for src in (int(s) for s in args.sizes.split(",")):
            uniq = make_tiles(td, src, args.distinct, rng)
            paths = [uniq[i % len(uniq)] for i in range(args.tiles)]
            # fidelity reference for this source size (single pass, 1 thread)
            full_ref, _ = nt.load_tiles_u8(uniq, size=args.target, n_threads=1)

            def bench(name, fn, scaled_out=None):
                ts = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    fn()
                    ts.append(time.perf_counter() - t0)
                row = {
                    "src": src, "target": args.target, "method": name,
                    "tiles_per_s_core": round(args.tiles / min(ts), 1),
                }
                if scaled_out is not None:
                    d = np.abs(full_ref.astype(np.float32)
                               - scaled_out.astype(np.float32))
                    row["mean_abs_d_u8"] = round(float(d.mean()), 3)
                    row["max_abs_d_u8"] = float(d.max())
                rows.append(row)
                print(json.dumps(row), flush=True)

            bench("native_full",
                  lambda: nt.load_tiles_u8(paths, size=args.target, n_threads=1))
            scal, _ = nt.load_tiles_u8(uniq, size=args.target, n_threads=1,
                                       scaled_dct=True)
            bench("native_scaled_dct",
                  lambda: nt.load_tiles_u8(paths, size=args.target,
                                           n_threads=1, scaled_dct=True),
                  scaled_out=scal)
            bench("pil_full", lambda: pil_decode(paths, args.target, False))
            bench("pil_draft", lambda: pil_decode(paths, args.target, True),
                  scaled_out=pil_decode(uniq, args.target, True))


if __name__ == "__main__":
    main()
