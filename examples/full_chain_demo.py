"""Complete five-pipeline demo on a synthetic cohort, through the real CLIs.

Exercises every capability end-to-end: tiling -> histopathology MIL training/
savescore/extractfeatures -> RNA pipeline -> early fusion (concat + MLP) ->
late fusion (merge + Cox elastic-net) -> joint fusion. Runs on CPU in ~5-6
minutes (single core); pass a work dir as argv[1] (default /tmp/mmbs_demo).

Usage: python examples/full_chain_demo.py [workdir]
"""
import os
import sys

import jax

# default to CPU so the demo never claims an accelerator; set MMBS_DEMO_TPU=1
# to run the device-side steps on real hardware
if os.environ.get("MMBS_DEMO_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
import numpy as np, pandas as pd, json, cv2, time
workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mmbs_demo"
os.makedirs(workdir, exist_ok=True)
os.chdir(workdir)
T0=time.time()
def lap(msg): print(f"[{time.time()-T0:6.1f}s] {msg}", flush=True)

rng = np.random.default_rng(3)
os.makedirs('wsi', exist_ok=True)
cases = [f"TCGA-{i:02d}" for i in range(12)]
wsis = [f"{c}-DX1" for c in cases]
# slide tissue darkness correlates with hazard
signal = rng.uniform(0, 1, len(cases))
for w, s in zip(wsis, signal):
    slide = np.full((384, 384, 3), 245, np.uint8)
    yy, xx = np.mgrid[0:384, 0:384]
    blob = (yy-192)**2 + (xx-192)**2 < 150**2
    base = np.array([200-60*s, 120-40*s, 160-50*s])
    tex = rng.integers(0, 40, size=(384,384,3))
    img = (base[None,None,:] - tex*0.5).clip(0,255).astype(np.uint8)
    slide[blob] = img[blob]
    cv2.imwrite(f"wsi/{w}.png", slide[:, :, ::-1])

from multimodalbrainsurvival_tpu.cli import (wsi2patches, histo_train, histo_savescore,
    histo_extractfeatures, rna_train, rna_savescore, rna_extractfeatures,
    concat_features, feature_train, merge_scores, late_fusion, joint_train, joint_savescore)

wsi2patches.main(['--wsi_path','wsi','--patch_path','patches','--mask_path','masks',
                  '--patch_size','64','--max_patches_per_slide','12','--num_process','4','--ext','png'])
lap("tiled")

G = 30
months = (rng.exponential(np.exp(-2*(signal-0.5))) * 30).round(3)
status = (rng.uniform(size=len(cases)) < 0.85).astype(int)
Xr = rng.normal(size=(len(cases), G)).astype(np.float32)
Xr[:, 0] = 2*signal + rng.normal(size=len(cases))*0.3  # rna signal too
splits = {"train": range(0,6), "val": range(6,9), "test": range(9,12)}
for sp, idx in splits.items():
    idx = list(idx)
    base = pd.DataFrame({"case":[cases[i] for i in idx], "survival_months":months[idx],
                         "vital_status":status[idx], "wsi_file_name":[wsis[i]+".svs" for i in idx]})
    base.to_csv(f"ffpe_{sp}.csv", index=False)
    rna = base.drop(columns=["wsi_file_name"]).copy()
    for g in range(G): rna[f"rna_{g}"] = Xr[idx, g]
    rna.to_csv(f"rna_{sp}.csv", index=False)
    joint = base.copy()
    for g in range(G): joint[f"rna_{g}"] = Xr[idx, g]
    joint.to_csv(f"joint_{sp}.csv", index=False)
    base[["case","survival_months","vital_status"]].to_csv(f"info_{sp}.csv", index=False)

histo_cfg = {"model_name":"resnet18","num_classes":1,"batch_size":6,"use_cuda":False,
  "data_path":"patches","train_csv_path":"ffpe_train.csv","val_csv_path":"ffpe_val.csv",
  "test_csv_path":"ffpe_test.csv","num_workers":4,"num_epochs":2,"img_size":64,
  "lr":5e-4,"weight_decay":1e-5,"weighted_sampler":True,"pretrained":False,
  "train_bag_size":2,"val_bag_size":2,"aggregator":"attention","aggregator_hdim":512,
  "task":"survival_prediction","n_layers_to_train":6,"flag":"ffpe_model",
  "max_patch_per_wsi_train":8,"max_patch_per_wsi_val":8,
  "checkpoint_path":"ffpe_out/","summary_path":"ffpe_out/summary/","model_path":"","restore_path":""}
json.dump(histo_cfg, open("config_ffpe_train.json","w"))
from multimodalbrainsurvival_tpu.cli import validate_data
assert validate_data.main(['--config','config_ffpe_train.json','--task','histo']) == 0
lap("cohort validated")
histo_train.main(['--config','config_ffpe_train.json'])
lap("histo trained")

sv = dict(histo_cfg); sv["model_path"]="ffpe_out/models/ffpe_model/model_last"; sv["output_path"]="scores/"
json.dump(sv, open("config_ffpe_savescore.json","w"))
histo_savescore.main(['--config','config_ffpe_savescore.json'])
ef = dict(sv); ef["output_path"]="feats/"
json.dump(ef, open("config_ffpe_extract.json","w"))
histo_extractfeatures.main(['--config','config_ffpe_extract.json'])
lap("histo savescore+extract")

rna_cfg = {"batch_size":6,"use_cuda":False,"train_csv_path":"rna_train.csv","val_csv_path":"rna_val.csv",
  "test_csv_path":"rna_test.csv","num_workers":1,"num_epochs":3,"lr_rna":1e-4,"lr_mlp":1e-4,
  "weight_decay":1e-5,"flag":"rna_model","checkpoint_path":"rna_out/","summary_path":"rna_out/summary/",
  "restore_path":"","model_path":""}
json.dump(rna_cfg, open("config_rna_train.json","w"))
rna_train.main(['--config','config_rna_train.json'])
rv = dict(rna_cfg); rv["model_path"]="rna_out/models/rna_model/model_last"; rv["output_path"]="scores/"
json.dump(rv, open("config_rna_savescore.json","w"))
rna_savescore.main(['--config','config_rna_savescore.json'])
re_ = dict(rv); re_["output_path"]="feats/"
json.dump(re_, open("config_rna_extract.json","w"))
rna_extractfeatures.main(['--config','config_rna_extract.json'])
lap("rna pipeline done")

for sp in splits:
    concat_features.main(['--rna_cases',f'feats/rna_cases_{sp}.csv','--rna_features',f'feats/rna_features_{sp}.csv',
        '--pathology_cases',f'feats/pathology_cases_{sp}.csv','--pathology_features',f'feats/pathology_features_{sp}.csv',
        '--patientinfo',f'info_{sp}.csv','--output',f'features_{sp}.csv'])
feat_cfg = {"batch_size":6,"use_cuda":False,"train_csv_path":"features_train.csv","val_csv_path":"features_val.csv",
  "test_csv_path":"features_test.csv","num_workers":1,"num_epochs":3,"lr":1e-5,"weight_decay":1e-5,
  "flag":"earlyfusion_model","checkpoint_path":"feat_out/","summary_path":"feat_out/summary/","restore_path":"","model_path":""}
json.dump(feat_cfg, open("config_feature_train.json","w"))
feature_train.main(['--config','config_feature_train.json'])
lap("early fusion done")

for sp in ["train","val"]:
    merge_scores.main(['--pathology_scores',f'scores/model_last_pathology_{sp}_df.csv',
        '--rna_scores',f'scores/rna_{sp}_df.csv','--output',f'combined_score_{sp}.csv'])
late_fusion.main(['--train_csv','combined_score_train.csv','--val_csv','combined_score_val.csv','--output_dir','late/'])
lap("late fusion done")

joint_cfg = dict(histo_cfg)
joint_cfg.update({"train_csv_path":"joint_train.csv","val_csv_path":"joint_val.csv","test_csv_path":"joint_test.csv",
  "lr_rna":1e-5,"lr_histo":5e-5,"lr_mlp":1e-3,"flag":"jointfusion_model","checkpoint_path":"joint_out/",
  "summary_path":"joint_out/summary/","histo_restore_path":"","rna_restore_path":"","num_epochs":2})
del joint_cfg["lr"]
json.dump(joint_cfg, open("config_joint_train.json","w"))
joint_train.main(['--config','config_joint_train.json'])
jv = dict(joint_cfg); jv["model_path"]="joint_out/models/jointfusion_model/model_last"; jv["output_path"]="scores/"
json.dump(jv, open("config_joint_savescore.json","w"))
joint_savescore.main(['--config','config_joint_savescore.json'])
lap("joint fusion done — ALL FIVE PIPELINES COMPLETE")

# --- streaming serving: score the test slides straight from the files (no
# tiling stage, no patch artifacts) with the models trained above
from multimodalbrainsurvival_tpu.cli import slide_extractfeatures, slide_joint_savescore
test_idx = list(splits["test"])
pd.DataFrame({"wsi_file_name": [f"{wsis[i]}.svs" for i in test_idx],  # .svs names, .png files: resolver probes
              "case": [cases[i] for i in test_idx]}).to_csv("serve_slides.csv", index=False)
serve_cfg = {"model_name":"resnet18","num_classes":1,"aggregator":"attention","aggregator_hdim":512,
  "img_size":64,"batch_size":8,"max_patches_per_slide":12,"use_cuda":False,
  "model_path":"ffpe_out/models/ffpe_model/model_last","slide_csv_path":"serve_slides.csv",
  "slide_path":"wsi","output_path":"serve/","save_patch_features":True}
json.dump(serve_cfg, open("config_slide_serve.json","w"))
slide_extractfeatures.main(['--config','config_slide_serve.json'])
lap("streaming slide serving done (scores + features + attention, zero patch artifacts)")

serve_joint_cfg = {"model_name":"resnet18","num_classes":1,"img_size":64,"batch_size":8,
  "max_patches_per_slide":12,"use_cuda":False,
  "model_path":"joint_out/models/jointfusion_model/model_last",
  "slide_csv_path":"joint_test.csv","slide_path":"wsi","output_path":"serve/"}
json.dump(serve_joint_cfg, open("config_slide_joint.json","w"))
slide_joint_savescore.main(['--config','config_slide_joint.json'])
lap("streaming joint (WSI+RNA) serving done — DEMO COMPLETE")
