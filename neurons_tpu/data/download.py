"""Dataset/weights download (reference download_dataset.py:1-15).

Pulls the CC2017 tensor dump and the NEURONS masks/annotations from the HF
hub. Network-gated: in offline environments this raises with instructions
instead of silently failing.
"""

from __future__ import annotations

import os


DATASETS = {
    "cc2017": "gongzx/cc2017_dataset",
    "neurons_masks": "McGregorW/NEURONS",
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
        repo = DATASETS[name]
        snapshot_download(repo_id=repo, repo_type="dataset",
                          local_dir=root_dir,
                          local_dir_use_symlinks=False)
        print(f"downloaded {repo} -> {root_dir}")


if __name__ == "__main__":
    import sys

    download(sys.argv[1] if len(sys.argv) > 1 else "./cc2017_dataset")
