"""Dataset fetch helper (counterpart of ``src/get_cc_dataset.py``).

Downloads the CommonCanvas CC-BY-ND shards via HF ``datasets`` when the
environment has egress; in air-gapped deployments point
``CommonCanvasDataset`` at a local ``load_from_disk`` directory instead.
"""

from __future__ import annotations

import argparse


def fetch_common_canvas(out_dir: str,
                        name: str = "common-canvas/commoncatalog-cc-by-nd",
                        split: str = "train"):
    import datasets
    ds = datasets.load_dataset(name, split=split)
    ds.save_to_disk(out_dir)
    return out_dir


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", required=True)
    p.add_argument("--name", default="common-canvas/commoncatalog-cc-by-nd")
    p.add_argument("--split", default="train")
    a = p.parse_args(argv)
    fetch_common_canvas(a.out_dir, a.name, a.split)


if __name__ == "__main__":
    main()
