"""Real-checkpoint verification gate for ``chadavit16-moyen``.

The reference publishes its canonical weights (HF ``nicoboou/chadavit16-moyen``,
md5 ``e8a24ac58b8e34bdce10e0024d507f2e`` — reference ``HOW_TO_USE.ipynb``
cells 8-9) but this environment has no network, so the file has never been
loaded here. This script is the gate, ready to fire the moment the file is
obtainable (VERDICT r2 item #6):

    python scripts/verify_checkpoint.py /path/to/chadavit16-moyen.ckpt
        checks the md5 against the published constant, extracts CLS embeddings
        for the FIXED seeded input battery (mirroring HOW_TO_USE cell-16), and
        compares them to committed goldens at >= 1 - 1e-4 cosine
        (tests/goldens/chadavit16_moyen_real.npz — captured on first verified
        load with --write-goldens).

    python scripts/verify_checkpoint.py --selftest
        proves the whole pipeline (torch .ckpt file -> encoder/backbone key
        remap -> packed-qkv split -> JAX model -> embeddings) against COMMITTED
        torch-oracle goldens, using a deterministic torch.manual_seed(0)
        checkpoint with the reference's exact state-dict layout. This is what
        makes the gate trustworthy before the real file exists.

    python scripts/verify_checkpoint.py [ckpt] --write-goldens
        (re)captures the golden file for the given mode. Selftest goldens are
        computed by the REFERENCE torch implementation (tests/oracle.py), not
        by this framework — parity is against an independent oracle.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")
SELFTEST_GOLDENS = os.path.join(GOLDEN_DIR, "chadavit16_moyen_selftest.npz")
REAL_GOLDENS = os.path.join(GOLDEN_DIR, "chadavit16_moyen_real.npz")

# the fixed input battery (HOW_TO_USE cell-16 shape: random images, 1-10
# channels). Seed and counts are part of the golden contract — do not change
# without regenerating goldens.
INPUT_SEED = 1234
CHANNEL_COUNTS = [1, 3, 10, 4, 2, 7, 5, 6]
IMG = 224
COSINE_GATE = 1.0 - 1e-4


def battery(img: int = IMG):
    rng = np.random.default_rng(INPUT_SEED)
    return [rng.standard_normal((c, img, img)).astype(np.float32)
            for c in CHANNEL_COUNTS]


def jax_embeddings(ckpt_path: str, img: int = IMG) -> np.ndarray:
    from chadavit_tpu.hub import extract_embeddings, load_chadavit16_moyen

    model, variables = load_chadavit16_moyen(ckpt_path, img_size=img)
    return extract_embeddings(model, variables, battery(img),
                              batch_size=len(CHANNEL_COUNTS))


def make_selftest_ckpt(path: str, img: int):
    """Deterministic reference-layout Lightning-style checkpoint."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from oracle import load_reference

    ref = load_reference()
    torch.manual_seed(0)
    model = ref.ChAdaViT(img_size=[img], patch_size=16, embed_dim=192, depth=12,
                         num_heads=2, return_all_tokens=False,
                         max_number_channels=10)
    model.eval()
    sd = {("encoder." + k): v for k, v in model.state_dict().items()}
    torch.save({"state_dict": sd, "epoch": 0}, path)
    return model


def torch_embeddings(model, img: int) -> np.ndarray:
    """Reference-path embeddings (HOW_TO_USE cells 20-26: ragged one-channel
    collate, mixed_channels=True)."""
    import torch

    imgs = battery(img)
    flat = np.concatenate([im.reshape(-1, 1, img, img) for im in imgs], 0)
    with torch.no_grad():
        out = model(x=torch.from_numpy(flat), index=0,
                    list_num_channels=[list(CHANNEL_COUNTS)])
    return out.numpy()


def cosine_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-12)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", nargs="?", help="chadavit16-moyen .ckpt file")
    ap.add_argument("--selftest", action="store_true",
                    help="verify the import pipeline against committed "
                         "torch-oracle goldens (no real checkpoint needed)")
    ap.add_argument("--write-goldens", action="store_true")
    ap.add_argument("--img", type=int, default=None,
                    help="input resolution; defaults to the committed goldens' "
                         "resolution for --selftest (so the bare invocation "
                         "always matches) and 224 for the real gate")
    ap.add_argument("--skip-md5", action="store_true",
                    help="bypass the published-md5 check (non-canonical file)")
    ap.add_argument("--tpu", action="store_true",
                    help="run the forward on the accelerator (default CPU: "
                         "parity does not need the chip, and a concurrent "
                         "training job may hold it)")
    args = ap.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.selftest:
        import tempfile

        img = args.img
        if img is None:  # match whatever resolution the goldens were captured at
            img = (int(np.load(SELFTEST_GOLDENS)["img"])
                   if os.path.exists(SELFTEST_GOLDENS) else 64)
        with tempfile.TemporaryDirectory() as td:
            ckpt = os.path.join(td, "selftest.ckpt")
            tmodel = make_selftest_ckpt(ckpt, img)
            got = jax_embeddings(ckpt, img)
            if args.write_goldens:
                os.makedirs(GOLDEN_DIR, exist_ok=True)
                want = torch_embeddings(tmodel, img)
                np.savez(SELFTEST_GOLDENS, embeddings=want, img=img,
                         seed=INPUT_SEED, counts=np.asarray(CHANNEL_COUNTS))
                print(f"wrote {SELFTEST_GOLDENS} (torch-oracle embeddings, "
                      f"img={img})")
            g = np.load(SELFTEST_GOLDENS)
            assert int(g["img"]) == img, (
                f"goldens were captured at img={int(g['img'])}, ran {img}")
            cos = cosine_rows(got, g["embeddings"])
            print(f"selftest cosine per image: {np.round(cos, 6).tolist()}")
            ok = bool((cos >= COSINE_GATE).all())
            print("selftest:", "PASS" if ok else "FAIL",
                  f"(gate {COSINE_GATE})")
            return 0 if ok else 1

    if not args.checkpoint:
        print("no checkpoint given; run with --selftest or a .ckpt path",
              file=sys.stderr)
        return 2

    if not args.skip_md5:
        import hashlib

        from chadavit_tpu.hub import CHADAVIT16_MOYEN_MD5

        digest = hashlib.md5(open(args.checkpoint, "rb").read()).hexdigest()
        if digest != CHADAVIT16_MOYEN_MD5:
            print(f"md5 {digest} != published {CHADAVIT16_MOYEN_MD5}",
                  file=sys.stderr)
            return 1
        print(f"md5 OK: {digest}")

    img = args.img if args.img is not None else IMG
    got = jax_embeddings(args.checkpoint, img)
    if args.write_goldens:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(REAL_GOLDENS, embeddings=got, img=img, seed=INPUT_SEED,
                 counts=np.asarray(CHANNEL_COUNTS))
        print(f"wrote {REAL_GOLDENS}; re-run to verify against them")
        return 0
    if not os.path.exists(REAL_GOLDENS):
        print("no committed real-checkpoint goldens yet "
              f"({REAL_GOLDENS}); run --write-goldens on a VERIFIED load "
              "(md5-checked) to capture them", file=sys.stderr)
        return 2
    g = np.load(REAL_GOLDENS)
    cos = cosine_rows(got, g["embeddings"])
    print(f"cosine per image: {np.round(cos, 6).tolist()}")
    ok = bool((cos >= COSINE_GATE).all())
    print("verify:", "PASS" if ok else "FAIL", f"(gate {COSINE_GATE})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
