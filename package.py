"""Build dist/engine.zip for ``spark-submit --py-files``."""

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))
PKG = "annual_report_pdf_parsers_spark"


def build(out: str = "dist/engine.zip") -> str:
    out_path = os.path.join(ROOT, out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for base, _dirs, files in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in base:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(base, f)
                    zf.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    print(build())
