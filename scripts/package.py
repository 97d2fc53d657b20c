"""Build the --py-files artifact for spark-submit deployment.

Usage:
  python scripts/package.py                  # writes .data/datasmith_spark.zip
  spark-submit --master <cluster> \
      --py-files .data/datasmith_spark.zip \
      scripts/run_pipeline.py --input <clips_parquet> --out <table_dir>

The zip contains only the importable package (no tests/fixtures); executors
unpack it onto their PYTHONPATH. Equivalent of the reference's editable
install (/root/reference/pyproject.toml) for cluster shipping.
"""

from __future__ import annotations

import os
import shutil


def main() -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, ".data"), exist_ok=True)
    out = shutil.make_archive(
        os.path.join(repo, ".data", "datasmith_spark"), "zip",
        root_dir=repo, base_dir="datasmith_spark",
    )
    print(out)
    return out


if __name__ == "__main__":
    main()
