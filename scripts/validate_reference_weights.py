"""One-command validation of the reference's REAL pretrained weights.

The reference ships trained ``CRAFT.pth``/``CRNN.pth`` via Google Drive
(``/root/reference/scripts/get_model.sh:1-13``, loaded at
``ocr/net.py:59-69,134-150``).  This environment cannot fetch them, so
day-to-day parity rests on shared-random-weight oracles — but the day
the artifacts exist, THIS script is the promised one command
(README §Weights): fetch (optional) -> import audit -> the full
pipeline-vs-reference golden chain on the actual weights.

Phases
------
1. **resolve**  — find ``CRAFT.pth`` + ``CRNN.pth`` in ``--weights-dir``;
   ``--fetch`` runs ``scripts/get_model.sh`` first.  ``--dry-run``
   instead synthesizes stand-in checkpoints from the reference's OWN
   torch model classes (``ocr/model.py:9-118``, torch-default init,
   full real key sets incl. ``num_batches_tracked`` and TPS buffers)
   into a temp dir — every later phase then runs unchanged, so the
   plumbing is continuously testable without the gated artifacts
   (tests/test_validate_weights.py).
2. **import**   — torch-load each file, audit the key mapping (every
   template leaf sourced, every real torch key consumed —
   ``utils/torch_import.audit_torch_import``), import, and check the
   export roundtrip is bit-exact.
3. **e2e**      — both stacks load the SAME files: the reference's
   actual ``ocr/net.py`` engines (via tests/reference_oracle) and this
   repo's engines; a synthetic receipt (or ``--image``) runs through
   both full chains.  Gates: equal box count, mean IoU >= 0.99
   (min >= 0.95), transcripts identical, confidences within 5e-3
   (BASELINE.md contract).

With real TRAINED weights the score distribution is bimodal and the
reference's production thresholds (0.4/0.7) apply; ``--dry-run``'s
random weights need quantile thresholds for components to fire at all
(same trick as tests/test_e2e_parity.py::_pick_thresholds).

Usage:
    python scripts/validate_reference_weights.py                # real
    python scripts/validate_reference_weights.py --fetch        # + download
    python scripts/validate_reference_weights.py --dry-run      # plumbing
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402


def _fail(msg: str) -> "int":
    print(f"FAIL: {msg}", flush=True)
    return 1


def _make_blob_receipt(rng, h, w, words=12):
    """Equal-channel synthetic receipt: light paper, dark word blobs
    (tests/test_e2e_parity.py::_make_receipt geometry)."""
    g = np.full((h, w), 232, np.float64)
    g += rng.standard_normal((h, w)) * 3.0
    for _ in range(words):
        wh = int(rng.integers(22, 34))
        ww = int(rng.integers(70, min(140, w - 20)))
        r = int(rng.integers(8, h - wh - 8))
        c = int(rng.integers(8, w - ww - 8))
        g[r:r + wh, c:c + ww] = 40 + rng.standard_normal((wh, ww)) * 25.0
    g = np.clip(g, 0, 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def resolve_weights(args) -> str | None:
    """Weights directory containing CRAFT.pth + CRNN.pth, or None."""
    if args.dry_run:
        import torch

        from reference_oracle import load_reference_engines

        from lightly_ocr_tpu.config import load_config
        from lightly_ocr_tpu.engines import CRAFT, CRNN
        from lightly_ocr_tpu.utils.torch_import import (
            export_torch_state_dict,
        )

        refnet, _, _ = load_reference_engines()
        d = tempfile.mkdtemp(prefix="refweights_dryrun_")
        # Stand-in values come from OUR seeded engines exported to
        # torch, completed with the reference template's torch-only
        # extras (num_batches_tracked, TPS buffers) so the files carry
        # the FULL real key sets.  Torch-default init is unusable for
        # the e2e leg — measured: its score maps span ±0.02 while
        # cross-framework f32 drift is ~6.5e-4, so component structure
        # is threshold-lottery at any operating point; flax-init
        # weights give the golden suite's proven dynamic range.  Value
        # fidelity of the torch->flax import direction is gated by the
        # bit-exact roundtrip in the import phase either way.
        cfg = load_config(
            os.path.join("/root/reference/ocr", "config.yml")
        )
        engines = {
            "CRAFT.pth": (CRAFT(cfg, seed=3).variables,
                          lambda: refnet.VGG_UNet()),
            "CRNN.pth": (CRNN(cfg, seed=7).variables,
                         lambda: refnet.CRNNet(
                             refnet.CONFIG, torch.device("cpu"))),
        }
        for name, (variables, builder) in engines.items():
            sd = {
                k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in export_torch_state_dict(variables).items()
            }
            for k, v in builder().state_dict().items():
                sd.setdefault(k, v)
            torch.save(sd, os.path.join(d, name))
        print(f"resolve: dry-run stand-ins (full reference key sets, "
              f"flax-init values) in {d}", flush=True)
        return d
    d = args.weights_dir
    missing = [n for n in ("CRAFT.pth", "CRNN.pth")
               if not os.path.isfile(os.path.join(d, n))]
    if missing and args.fetch:
        print(f"resolve: fetching into {d} (scripts/get_model.sh)",
              flush=True)
        subprocess.run(
            ["bash", os.path.join(REPO, "scripts", "get_model.sh"), d],
            check=True,
        )
        missing = [n for n in ("CRAFT.pth", "CRNN.pth")
                   if not os.path.isfile(os.path.join(d, n))]
    if missing:
        print(
            f"resolve: {', '.join(missing)} not in {d} — drop the "
            "reference checkpoints there (scripts/get_model.sh documents "
            "the Google Drive source) or pass --fetch / --dry-run",
            flush=True,
        )
        return None
    print(f"resolve: real weights in {d}", flush=True)
    return d


def audit_and_import(weights_dir: str, cfg):
    """Phase 2: strict key audit + import + bit-exact export roundtrip."""
    import jax

    from lightly_ocr_tpu.engines import CRAFT, CRNN
    from lightly_ocr_tpu.models.crnn import CRNNet
    from lightly_ocr_tpu.models.vgg_unet import VGG_UNet
    from lightly_ocr_tpu.utils.torch_import import (
        audit_torch_import,
        export_torch_state_dict,
        import_torch_state_dict,
        load_torch_checkpoint,
        strip_module_prefix,
    )
    import jax.numpy as jnp

    templates = {
        "CRAFT.pth": VGG_UNet().init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        ),
        "CRNN.pth": CRNNet(cfg).init(
            jax.random.key(0),
            jnp.zeros((1, cfg.height, cfg.width, 1), jnp.float32),
            jnp.zeros((1, cfg.num_steps), jnp.int32),
            False,
        ),
    }
    for name, template in templates.items():
        sd = load_torch_checkpoint(os.path.join(weights_dir, name))
        missing, unconsumed = audit_torch_import(template, sd)
        if missing:
            raise SystemExit(_fail(
                f"{name}: {len(missing)} template leaves unsourced, e.g. "
                + ", ".join(missing[:5])
            ))
        if unconsumed:
            raise SystemExit(_fail(
                f"{name}: {len(unconsumed)} torch keys would be dropped, "
                "e.g. " + ", ".join(unconsumed[:5])
            ))
        variables = import_torch_state_dict(template, sd)
        back = export_torch_state_dict(variables)
        ref = strip_module_prefix(sd)
        for k, v in back.items():
            rv = np.asarray(ref[k], np.float32)
            if not np.array_equal(v.astype(np.float32), rv):
                raise SystemExit(_fail(
                    f"{name}: import->export roundtrip not bit-exact at {k}"
                ))
        print(f"import: {name} — every key consumed, roundtrip bit-exact "
              f"({len(sd)} torch keys)", flush=True)
    det = CRAFT(cfg, model_path=os.path.join(weights_dir, "CRAFT.pth"))
    rec = CRNN(cfg, model_path=os.path.join(weights_dir, "CRNN.pth"))
    return det, rec


def run_e2e(weights_dir: str, det, rec, cfg, args) -> int:
    """Phase 3: both stacks on the same weights, full chains compared."""
    import torch

    from reference_oracle import load_reference_engines

    refnet, refpipe, _ = load_reference_engines()
    old = refnet.MODEL_PATH
    refnet.MODEL_PATH = weights_dir
    try:
        ref_det = refnet.CRAFT(device=torch.device("cpu"))
        ref_rec = refnet.CRNN(device=torch.device("cpu"))
    finally:
        refnet.MODEL_PATH = old

    if args.image:
        from PIL import Image

        # Equal-channel (luma-replicated) so both stacks see the same
        # pixels: on a COLOR image the legs diverge BY DESIGN — this
        # repo is RGB-correct while the reference feeds cv2's BGR into
        # RGB-ordered normalization and BGR2GRAY (pipeline.py module
        # docstring, deviation #1) — and the parity gates would fail
        # spuriously.  Grayscale receipts still exercise legibility.
        image = np.asarray(Image.open(args.image).convert("L"))
        image = np.repeat(image[:, :, None], 3, axis=2)
        print("note: --image collapsed to equal-channel gray (the "
              "reference's BGR/RGB mix makes color inputs diverge by "
              "design)", flush=True)
    else:
        # equal-channel blob receipt (the golden tests' geometry,
        # tests/test_e2e_parity.py::_make_receipt): blobs sized so a
        # +-2 px cross-framework edge wobble stays inside the IoU
        # budget, and R==G==B so the reference's BGR reads equal our
        # RGB.  Parity needs identical outputs, not readable text —
        # with real weights pass --image for a legibility check too.
        image = _make_blob_receipt(
            np.random.default_rng(29), args.receipt_h, args.receipt_w
        )

    # operating point: trained weights -> production thresholds; the
    # dry run's random weights need score-quantile thresholds to fire
    if args.dry_run:
        maps, ratio = det.score_maps(image)
        h2 = int(image.shape[0] * ratio) // 2
        w2 = int(image.shape[1] * ratio) // 2
        region = np.asarray(maps[:h2, :w2, 0], np.float64)
        link = np.asarray(maps[:h2, :w2, 1], np.float64)
        cfg = cfg.replace(
            low_text=float(np.quantile(region, 0.86)),
            text_threshold=float(np.quantile(region, 0.93)),
            link_threshold=float(np.quantile(link, 0.90)),
        )
        from lightly_ocr_tpu.engines import CRAFT, CRNN

        det = CRAFT(cfg, variables=det.variables)
        rec = CRNN(cfg, variables=rec.variables)
    ref_det.canvas_size = cfg.canvas_size
    ref_det.magnify_ratio = cfg.magnify_ratio
    ref_det.lowTxtScore = cfg.low_text
    ref_det.txtThreshold = cfg.text_threshold
    ref_det.linkThreshold = cfg.link_threshold

    # reference rects (net.py:100-111 capture) in reading order —
    # shared oracle protocol with tests/test_e2e_parity.py
    from reference_oracle import clip_rects, reference_rects

    ref_rects = reference_rects(ref_det, image)
    h, w = image.shape[:2]
    ref_clip = clip_rects(ref_rects, h, w)

    ours = det.detect_rects(image).astype(np.float64)
    if len(ours) != len(ref_clip):
        return _fail(f"box count: ours {len(ours)} vs ref {len(ref_clip)}")
    if len(ref_clip) < 3:
        return _fail(f"only {len(ref_clip)} boxes fired — gate is vacuous "
                     "(wrong thresholds for these weights?)")

    def iou(a, b):
        r0, c0 = max(a[0], b[0]), max(a[1], b[1])
        r1, c1 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0, r1 - r0) * max(0, c1 - c0)
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / max(ua, 1e-9)

    ious = [iou(a, b) for a, b in zip(ours, ref_clip)]
    print(f"e2e: {len(ours)} boxes, IoU mean {np.mean(ious):.4f} "
          f"min {np.min(ious):.4f}", flush=True)
    if np.mean(ious) < 0.99 or np.min(ious) < 0.95:
        return _fail("box IoU below the BASELINE gate (mean>=0.99, "
                     "min>=0.95)")

    # transcripts: reference per-crop loop (net.py:152-193) vs ours
    import cv2

    ref_texts, ref_confs = [], []
    with torch.no_grad():
        for r in ref_clip.astype(np.int64):
            crop = image[r[0]:r[2], r[1]:r[3], :]
            gray = cv2.cvtColor(crop, cv2.COLOR_BGR2GRAY)
            raw_pred, preds = ref_rec.getPreds(gray)
            probs = torch.nn.functional.softmax(preds, dim=2)
            max_probs, _ = probs.max(dim=2)
            text = raw_pred[0]
            if "[s]" in text:
                eos = text.index("[s]")
                conf = (float(max_probs[0][:eos].cumprod(dim=0)[-1])
                        if eos else 0.0)
                text = text[:eos]
            else:
                conf = 0.0
            ref_texts.append(text)
            ref_confs.append(conf)

    from lightly_ocr_tpu.pipeline import get_text_detailed

    items = get_text_detailed(image, det, rec)
    our_texts = [it["text"] for it in items]
    our_confs = [it["confidence"] for it in items]
    n_match = sum(o == r for o, r in zip(our_texts, ref_texts))
    print(f"e2e: transcripts {n_match}/{len(ref_texts)} identical",
          flush=True)
    if our_texts != ref_texts:
        diffs = [(o, r) for o, r in zip(our_texts, ref_texts) if o != r]
        return _fail(f"transcripts diverge, e.g. {diffs[:3]}")
    if not np.allclose(our_confs, ref_confs, rtol=5e-3, atol=5e-4):
        return _fail("confidences diverge beyond rtol=5e-3")
    print("PASS: reference weights validated end to end "
          f"({'dry-run stand-ins' if args.dry_run else 'REAL artifacts'})",
          flush=True)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--weights-dir",
                   default=os.path.join(REPO, "save_models"))
    p.add_argument("--fetch", action="store_true",
                   help="run scripts/get_model.sh if files are missing")
    p.add_argument("--dry-run", action="store_true",
                   help="synthesize stand-in .pth files from the "
                        "reference torch classes (offline plumbing test)")
    p.add_argument("--image", default=None,
                   help="validate on this receipt image instead of a "
                        "synthetic one")
    # the golden suite's proven-stable geometry (test_e2e_parity.py
    # "standard" case): 12 well-separated blobs on 360x280 — denser/
    # smaller receipts put component structure on threshold knife-edges
    p.add_argument("--receipt-h", type=int, default=360)
    p.add_argument("--receipt-w", type=int, default=280)
    p.add_argument("--canvas-size", type=int, default=None,
                   help="override canvas cap (default: reference config)")
    p.add_argument("--phases", default="resolve,import,e2e",
                   help="comma subset of resolve,import,e2e (the fast "
                        "plumbing gate in CI runs resolve,import)")
    args = p.parse_args(argv)
    phases = {t.strip() for t in args.phases.split(",") if t.strip()}

    weights_dir = resolve_weights(args)
    if weights_dir is None:
        return 2  # distinct exit: artifacts unavailable, not a failure

    from lightly_ocr_tpu.config import load_config

    cfg = load_config(os.path.join("/root/reference/ocr", "config.yml")
                      if os.path.isdir("/root/reference/ocr") else None)
    cfg = cfg.replace(bucket_granularity=32, max_boxes=64,
                      **({"canvas_size": args.canvas_size}
                         if args.canvas_size else {}))
    if "import" not in phases:
        print("phases: skipping import/e2e", flush=True)
        return 0
    det, rec = audit_and_import(weights_dir, cfg)
    if "e2e" not in phases:
        print("PASS: resolve+import phases complete (e2e skipped by "
              "--phases)", flush=True)
        return 0
    return run_e2e(weights_dir, det, rec, cfg, args)


if __name__ == "__main__":
    sys.exit(main())
