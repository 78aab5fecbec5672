"""Dataset/weights download (reference download_dataset.py:1-15).

Pulls the CC2017 tensor dump and the NEURONS masks/annotations from the HF
hub. Network-gated: in offline environments this raises with instructions
instead of silently failing.
"""

from __future__ import annotations

import os


# name -> (repo_id, repo_type, allow_patterns); mirrors the reference's
# two snapshot_download calls exactly: the tensor dump is a *dataset*
# repo pulled whole, the masks/annotations live in the NEURONS *model*
# repo and MUST be pattern-filtered (the same repo also hosts the >60 GB
# EXP artifact dump).
DATASETS = {
    "cc2017": ("gongzx/cc2017_dataset", "dataset", None),
    "neurons_masks": ("McGregorW/NEURONS", "model",
                      ["masks/*", "qwen_annotation/*"]),
}


def download(root_dir: str = "./cc2017_dataset",
             repos=("cc2017", "neurons_masks")) -> None:
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise RuntimeError("huggingface_hub is required to download the "
                           "dataset") from e
    os.makedirs(root_dir, exist_ok=True)
    for name in repos:
        repo, rtype, patterns = DATASETS[name]
        kw = {"allow_patterns": patterns} if patterns else {}
        snapshot_download(repo_id=repo, repo_type=rtype,
                          local_dir=root_dir,
                          local_dir_use_symlinks=False, **kw)
        print(f"downloaded {repo} -> {root_dir}")


WEIGHTS = {
    # reference README.md:31-99 + animatediff auto_download (util.py:77-89)
    "animatediff": ("guoyww/animatediff", "model",
                    ["v3_sd15_mm.ckpt", "v3_sd15_adapter.ckpt",
                     "v3_sd15_sparsectrl_rgb.ckpt"]),
    "neurons_exp": ("McGregorW/NEURONS", "model", None),  # EXP dump (>60GB)
}


def download_weights(weights_dir: str = "./pretrained_weights",
                     bundles=("animatediff",)) -> None:
    """auto_download equivalent (reference animatediff/utils/util.py:77-89:
    existence-check then hub fetch)."""
    from huggingface_hub import hf_hub_download, snapshot_download

    os.makedirs(weights_dir, exist_ok=True)
    for name in bundles:
        repo, rtype, files = WEIGHTS[name]
        if files is None:
            snapshot_download(repo_id=repo, repo_type=rtype,
                              local_dir=weights_dir)
            continue
        for f in files:
            dest = os.path.join(weights_dir, f)
            if os.path.exists(dest):
                continue
            hf_hub_download(repo_id=repo, filename=f, repo_type=rtype,
                            local_dir=weights_dir)
            print(f"downloaded {repo}/{f} -> {weights_dir}")


if __name__ == "__main__":
    import sys

    download(sys.argv[1] if len(sys.argv) > 1 else "./cc2017_dataset")
