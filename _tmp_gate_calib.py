"""Calibrate the fixture-corpus quality gate: reuse /tmp/corpus_r4's
prepared data, train the autodecoder at several epoch budgets, measure."""
import os, time, shutil
import numpy as np
from shapegan_tpu.core.config import TrainConfig
from shapegan_tpu.data.prepare import PrepareConfig
from shapegan_tpu.train import sdf_autodecoder as ad
import run_fixture_corpus as rfc

workdir = "/tmp/corpus_r4"
config = PrepareConfig(
    output_dir=os.path.join(workdir, "data", "fixtures"),
    voxel_resolutions=[8, 16, 32], uniform_count=16384,
    surface_count=16384, cloud_count=50000,
)

for ad_epochs in (160, 400):
    mdir = os.path.join(workdir, f"models_{ad_epochs}")
    pdir = os.path.join(workdir, f"plots_{ad_epochs}")
    ad_cfg = TrainConfig(
        nogui=True, epochs=ad_epochs, seed=0,
        data_dir=os.path.join(workdir, "data"),
        model_dir=mdir, plot_dir=pdir,
        extras={"pointcloud_size": str(config.cloud_count)},
    )
    t0 = time.time()
    ad_params, ad_latents = ad.train(ad_cfg)
    t_train = time.time() - t0
    t0 = time.time()
    q = rfc.quality_gate(workdir, config, ad_params, ad_latents,
                         overfit_epochs=ad_epochs)
    print(f"=== ad_epochs={ad_epochs} (train {t_train:.0f}s, gate {time.time()-t0:.0f}s) ===")
    for k, v in q.items():
        print(f"  {k}: {v}")
