"""Maintain QUERY_SOURCES.json — the diff-aware-rotation manifest.

Each entry records the md5 of a query's registered-function source
(decorators + oracle string included) AS OF its latest driver
verification, so `ripcurrent_spark.queries.driver_check_order` can
put queries whose implementation changed since their latest
CORRECTNESS row at the FRONT of the next round's gate window
(VERDICT r6 #1 — a rewritten query must not coast on a green row
that pre-dates the rewrite).

Two modes:

- default (--from-artifact, VERDICT r7 #5): derive stamps from the
  COMMITTED CORRECTNESS_r{N}.json — for every GREEN row in the latest
  (or --round N) artifact, record the query's source hash AS OF the
  commit the driver actually verified (the artifact commit's parent,
  via git) with round = N. Run at the START of a round, after the
  driver lands the previous round's artifact. This replaces the
  pre-r8 predict-the-window mode, which stamped hashes for rows that
  did not exist yet (commit ba7c9b0): a mid-round registry change
  desynced prediction from reality, while a derivation cannot — the
  manifest's (name, round) pairs are provably a subset of the
  artifact's green keys (pinned by tests/test_rotation.py).
  MUST run at round START, before any code change: oracle_hash is
  taken from the CURRENT registry under the source-unchanged guard,
  which identifies the verified oracle value only while the tree
  still matches the verified commit for that query.

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


def _green_rows(artifact: Path) -> list[str]:
    """Names whose row in the artifact is green: no error, and every
    *_match field that is present is true (no_oracle rows carry only
    rows_match)."""
    rows = json.loads(artifact.read_text())
    out = []
    for name, r in rows.items():
        if not isinstance(r, dict):
            continue
        if r.get("err") == "no_oracle":
            # rows-only check, by design (queries with no oracle_sql
            # entry): the driver still ran the query — a valid row.
            if r.get("spark_rows") is not None:
                out.append(name)
            continue
        if r.get("err"):
            continue
        checks = [
            v for k, v in r.items() if k.endswith("_match") and v is not None
        ]
        if checks and all(checks):
            out.append(name)
    return out


def from_artifact(rnd: int | None = None) -> None:
    arts = {
        int(m.group(1)): p
        for p in ROOT.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"r(\d+)", p.stem))
    }
    if rnd is None:
        rnd = max(arts)
    commit = verified_commit_for_round(rnd)
    if commit is None:
        raise SystemExit(
            f"no 'round {rnd}: ...' artifact commit found — run after the "
            "driver's round commit lands"
        )
    hashes = _sources_at_commit(commit)
    green = _green_rows(arts[rnd])
    manifest = json.loads(MANIFEST.read_text()) if MANIFEST.exists() else {}
    # Current registry: when a query's function source is UNCHANGED
    # between the verified commit and now, its currently-registered
    # oracle VALUE is the one the driver verified — record its hash so
    # driver_check_order can flag later computed-oracle rewrites whose
    # helper changed but whose function source did not (r11). When the
    # source already differs, omit oracle_hash: the source mismatch
    # alone marks the query changed.
    from ripcurrent_spark.queries import (
        REGISTRY,
        all_queries,
        oracle_value_hash,
        query_source_hash,
    )

    all_queries()  # populate REGISTRY
    stamped, missing = 0, []
    for name in green:
        if name in hashes:
            manifest[name] = {"hash": hashes[name], "round": rnd}
            if (
                name in REGISTRY
                and query_source_hash(REGISTRY[name].spark) == hashes[name]
            ):
                manifest[name]["oracle_hash"] = oracle_value_hash(name)
            stamped += 1
        else:
            # Green row for a query not locatable at the verified
            # commit (renamed file, moved decorator): drop any stale
            # entry so driver_check_order treats it as changed.
            manifest.pop(name, None)
            missing.append(name)
    MANIFEST.write_text(json.dumps(dict(sorted(manifest.items())), indent=1) + "\n")
    print(
        f"from-artifact: stamped {stamped} green round-{rnd} rows from "
        f"{arts[rnd].name} at verified commit {commit[:12]}"
    )
    if missing:
        print("  unresolvable (left as changed):", ", ".join(sorted(missing)))


if __name__ == "__main__":
    if "--bootstrap" in sys.argv:
        bootstrap()
    else:
        args = [a for a in sys.argv[1:] if a not in ("--from-artifact",)]
        from_artifact(int(args[args.index("--round") + 1]) if "--round" in args else None)
