"""Maintain QUERY_SOURCES.json — the diff-aware-rotation manifest.

Each entry records the md5 of a query's registered-function source
(decorators + oracle string included) AS OF its latest driver
verification, so `ripcurrent_spark.queries.driver_check_order` can
put queries whose implementation changed since their latest
CORRECTNESS row at the FRONT of the next round's gate window
(VERDICT r6 #1 — a rewritten query must not coast on a green row
that pre-dates the rewrite).

Two modes:

- default (round-end): predict the upcoming round's gate window (the
  first GATE_WINDOW names of the current diff-aware order) and stamp
  those entries with the CURRENT source hash and round = latest
  recorded round + 1. Run this as the LAST commit of a round — the
  driver verifies exactly that commit, so the recorded hashes are
  precisely what the new rows vouch for. Entries outside the window
  keep their previous hashes. If the driver's actual sample diverges
  from the prediction, driver_check_order distrusts any entry whose
  recorded round never produced a row (round > latest actual row) —
  self-correcting in the conservative direction.

- --bootstrap: reconstruct historical entries from git. Round N's
  driver verified the PARENT of the "round N: verdict/..." artifact
  commit; for every query whose latest row is round N, extract its
  decorated function source from `git show <parent>:<file>` for each
  queries/*.py at that commit (ast-based, no import of old code) and
  hash it. Queries that cannot be located at their verified commit
  get NO entry — driver_check_order treats them as changed, which
  front-loads their re-verification (the safe failure mode).
"""

from __future__ import annotations

import ast
import hashlib
import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
MANIFEST = ROOT / "QUERY_SOURCES.json"
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, check=True, capture_output=True, text=True
    ).stdout


def verified_commit_for_round(rnd: int) -> str | None:
    """The commit round `rnd`'s driver verified = parent of the
    'round {rnd}: ...' artifact commit (artifacts land right after)."""
    out = _git("log", "--format=%H %s")
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if re.match(rf"round {rnd}: ", subject):
            return _git("rev-parse", f"{sha}^").strip()
    return None


def _sources_at_commit(commit: str) -> dict[str, str]:
    """query name -> md5(function source incl. decorators) for every
    @register("name", ...) function under ripcurrent_spark/queries at
    `commit`. Mirrors inspect.getsource's decorator-through-end span."""
    files = [
        f
        for f in _git("ls-tree", "-r", "--name-only", commit).splitlines()
        if f.startswith("ripcurrent_spark/queries/") and f.endswith(".py")
    ]
    out: dict[str, str] = {}
    for f in files:
        try:
            text = _git("show", f"{commit}:{f}")
            tree = ast.parse(text)
        except (subprocess.CalledProcessError, SyntaxError):
            continue
        lines = text.splitlines(keepends=True)
        for node in tree.body:
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            name = None
            for dec in node.decorator_list:
                if (
                    isinstance(dec, ast.Call)
                    and isinstance(dec.func, ast.Name)
                    and dec.func.id == "register"
                    and dec.args
                    and isinstance(dec.args[0], ast.Constant)
                    and isinstance(dec.args[0].value, str)
                ):
                    name = dec.args[0].value
            if name is None:
                continue
            start = min([d.lineno for d in node.decorator_list] + [node.lineno]) - 1
            src = "".join(lines[start : node.end_lineno])
            out[name] = hashlib.md5(src.encode()).hexdigest()
    return out


def bootstrap() -> None:
    from ripcurrent_spark.queries import correctness_rounds

    seen = correctness_rounds()
    by_round: dict[int, list[str]] = {}
    for name, rnd in seen.items():
        by_round.setdefault(rnd, []).append(name)

    manifest: dict[str, dict] = {}
    missing: list[str] = []
    for rnd in sorted(by_round):
        commit = verified_commit_for_round(rnd)
        if commit is None:
            missing.extend(by_round[rnd])
            continue
        hashes = _sources_at_commit(commit)
        for name in by_round[rnd]:
            if name in hashes:
                manifest[name] = {"hash": hashes[name], "round": rnd}
            else:
                missing.append(name)
    MANIFEST.write_text(json.dumps(dict(sorted(manifest.items())), indent=1) + "\n")
    print(f"bootstrap: {len(manifest)} entries, {len(missing)} unresolvable")
    if missing:
        print("  (treated as changed-since-verified):", ", ".join(sorted(missing)))


def round_end() -> None:
    from ripcurrent_spark.queries import (
        GATE_WINDOW,
        all_queries,
        correctness_rounds,
        query_source_hash,
    )

    reg = all_queries()  # already in diff-aware driver_check_order
    next_round = max(correctness_rounds().values(), default=0) + 1
    window = list(reg)[:GATE_WINDOW]
    manifest = {}
    if MANIFEST.exists():
        manifest = json.loads(MANIFEST.read_text())
    for name in window:
        manifest[name] = {"hash": query_source_hash(reg[name].spark), "round": next_round}
    MANIFEST.write_text(json.dumps(dict(sorted(manifest.items())), indent=1) + "\n")
    print(f"round-end: stamped {len(window)} window entries for round {next_round}")
    print("window:", ", ".join(window))


if __name__ == "__main__":
    if "--bootstrap" in sys.argv:
        bootstrap()
    else:
        round_end()
