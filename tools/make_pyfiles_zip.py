#!/usr/bin/env python
"""Build the --py-files artifact for spark-submit deployment:

    python tools/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files htmlgraft.zip -m htmlgraft.job --input ... --out ...

Packages the htmlgraft package (source only, no tests/fixtures) so every
executor's Python worker can import it; the north rule's deployment shape
for multi-executor clusters.
"""

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "htmlgraft")
        for name in sorted(os.listdir(pkg)):
            if name.endswith(".py"):
                z.write(os.path.join(pkg, name), f"htmlgraft/{name}")
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "htmlgraft.zip")
    print(build(out))
