import glob, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from chadavit_tpu.cli import load_cfg, load_backbone_for_eval
from chadavit_tpu.config import parse_knn_cfg
from chadavit_tpu.data.classification import prepare_data, dataset_img_channels
from chadavit_tpu.eval.features import make_feature_fn
from chadavit_tpu.eval.knn import knn_classify

t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

cfg = parse_knn_cfg(load_cfg([
    "--config-path", "scripts/knn/idr100k_synth",
    "--config-name", "dino_idr10k_study.yaml",
    *sys.argv[1:]]))
log("cfg parsed")
# run ids are random per regeneration: when the configured checkpoint path is
# gone (/tmp recycled), fall back to the NEWEST finished checkpoint of the SAME
# pretrain run family (basename prefix before the run id, e.g. "dino-idr10k")
# under the same checkpoint root, so the drive never silently evaluates a
# different model family; mid-write orbax tmp dirs are excluded. Pass
# pretrained_feature_extractor=... explicitly to disable the fallback.
_cfg_ckpt = cfg.get("pretrained_feature_extractor") or ""
if not os.path.exists(_cfg_ckpt):
    root = os.path.dirname(os.path.dirname(_cfg_ckpt))  # .../<ckpt_dir>/dino
    family = os.path.basename(_cfg_ckpt).split("-offline-")[0] or "dino-idr10k"
    cands = [p for p in glob.glob(os.path.join(root, "*", f"{family}-*=*"))
             if "tmp" not in os.path.basename(p)
             and os.path.isfile(os.path.join(p, "_CHECKPOINT_METADATA"))]
    cands.sort(key=os.path.getmtime)
    if cands:
        log(f"configured ckpt missing; using newest {family} ckpt: {cands[-1]}")
        cfg.pretrained_feature_extractor = cands[-1]
model, params = load_backbone_for_eval(cfg)
log("backbone loaded")
img_channels = cfg.data.get("img_channels", dataset_img_channels(cfg.data.dataset))
tr, va = prepare_data(
    cfg.data.dataset, train_path=cfg.data.get("train_path"),
    val_path=cfg.data.get("val_path"),
    batch_size=cfg.optimizer.get("batch_size", 64),
    max_channels=10, num_workers=cfg.data.get("num_workers", 2),
    crop_size=224, sample_ratio=cfg.data.get("sample_ratio", 1.0),
    val_transform_for_train=True, bucket_round=int(cfg.data.get("bucket_round", 1)))
log(f"loaders ready: bank={len(tr.dataset)} val={len(va.dataset)}")
feature_fn = make_feature_fn(
    model, cfg.get("channels_strategy"),
    return_all_tokens=cfg.backbone.get("kwargs", {}).get("return_all_tokens", False),
    mixed_channels=cfg.get("mixed_channels", False),
    img_channels=img_channels)
def extract(loader, tag):
    feats, targs, n = [], [], 0
    for i, b in enumerate(loader):
        f = np.asarray(feature_fn(params, b["images"], b["channel_counts"]))
        feats.append(f); targs.append(np.asarray(b["labels"])); n += len(f)
        if i % 10 == 0:
            log(f"{tag} batch {i}: {n} imgs")
    return np.concatenate(feats), np.concatenate(targs)
bf, bt = extract(tr, "bank")
log(f"bank features {bf.shape}")
vf, vt = extract(va, "val")
log(f"val features {vf.shape}")
for k in (10, 20):
    acc1, acc5 = knn_classify(bf, bt, vf, vt, k=k, T=0.07,
                              distance_fx="cosine", num_classes=7)
    log(f"kNN k={k} cosine T=0.07 -> acc@1={acc1:.2f} acc@5={acc5:.2f}")
