"""Build dist/engine.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def iter_members():
    """Yield (path, archive_name) for every file the zip must carry:
    package .py files plus the tokenizer model data files — executors
    resolve the vocab/piece tables through importlib.resources when the
    plain filesystem path is absent (the zipimport branch of
    functions/wordpiece.py and functions/sp_unigram.py).

    Single source of truth for the member-selection rule: the staleness
    gate (tests/test_dist.py) imports THIS function, so the build and
    the check cannot drift.
    """
    pkg = REPO / "relation_extraction_cdr_spark"
    for pattern in ("*.py", "data/*"):
        for p in sorted(pkg.rglob(pattern)):
            if p.is_file():
                yield p, p.relative_to(REPO).as_posix()


def main() -> None:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "engine.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p, rel in iter_members():
            z.write(p, rel)
    print(out)


if __name__ == "__main__":
    main()
