"""Round-open hygiene check: the driver's closing bench run lands as a
WORKTREE edit to BENCH_LOCAL.json after the round's last commit, so three
rounds running the freshest bench evidence sat uncommitted at round open
(VERDICT r7-r9). Run this first thing each round:

    python tools/round_open_check.py            # report (exit 1 if dirty)
    python tools/round_open_check.py --commit   # commit the artifact as-is

The check is deliberately a standalone tool, not a pytest: bench runs
DURING a round legitimately dirty the file, so a test would flap — what
must never happen is OPENING a round without committing the driver's
closing numbers.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACTS = ["BENCH_LOCAL.json"]


def main() -> int:
    dirty: list[str] = []
    for name in ARTIFACTS:
        out = subprocess.run(
            ["git", "status", "--porcelain", "--", name],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()
        if out:
            dirty.append(name)
    if not dirty:
        print("round-open check: bench artifacts clean — nothing to commit")
        return 0
    if "--commit" in sys.argv[1:]:
        subprocess.run(["git", "add", "--"] + dirty, cwd=REPO, check=True)
        # pathspec-limited commit: anything ELSE already staged (a WIP
        # `git add -p`, say) must not be swept into the artifact commit
        subprocess.run(
            [
                "git",
                "commit",
                "-m",
                "Commit the driver's closing bench artifact at round open",
                "--",
            ]
            + dirty,
            cwd=REPO,
            check=True,
        )
        print(f"round-open check: committed {', '.join(dirty)}")
        return 0
    print(
        f"round-open check: UNCOMMITTED driver bench artifact(s): "
        f"{', '.join(dirty)} — run `python tools/round_open_check.py "
        f"--commit` before touching anything else",
        file=sys.stderr,
    )
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
