"""Bank run metrics into git the moment they print.

exp/ and /tmp are reset-mortal on this host (two converged runs' final
metrics died with them in round 3 — VERDICT r3 "what's weak" #6), so
anything that must survive is committed.  This scraper parses a training
log for `val:`/`FINAL`/`test:` metric lines (systems/split_occ.py:455,724,
scripts/train_synthetic.py:195) plus watchdog events, rewrites the run's
section in RESULTS.md, and commits iff the section changed.

Usage: python scripts/bank_metrics.py <logfile> <tag> [--no-commit] [--raw]

``--raw`` banks the whole file instead of pattern-matched lines (for
already-trimmed logs like the NaN-minimizer summary).

Idempotent and safe to run on a timer: a run's section is replaced
in-place between its BEGIN/END markers; only RESULTS.md is staged.
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "RESULTS.md")

HEADER = """# RESULTS — auto-banked run metrics

Raw metric lines scraped from training logs by `scripts/bank_metrics.py`
(invoked by `scripts/miniwatchdog.sh` on every watch tick).  Each run owns
one section, rewritten in place and committed as soon as new metrics
print, so converged evidence survives environment resets.  Summaries and
analysis live in BASELINE.md.
"""

# lines worth keeping forever: step-tagged vals, the final val, the test
# protocol result, relight/ablation summaries, watchdog lifecycle events
PATTERNS = [
    re.compile(r"^val(?:\[[^\]]*\])?: \{"),
    re.compile(r"^FINAL \{"),
    re.compile(r"^test: \{"),
    re.compile(r"^test protocol wall time"),
    re.compile(r"^total train time"),
    re.compile(r"^resumed from "),
    re.compile(r"^WATCHDOG:"),
    re.compile(r"^QUEUE\["),
    re.compile(r"^overrides:"),
    re.compile(r"^calibrated eval compaction"),
    re.compile(r"^step \d+\[s\d\].*skipped_nonfinite"),
    # bench.py: the one-line JSON result + roofline stderr summaries
    re.compile(r"^\{\"metric\""),
    re.compile(r"^=== "),
    re.compile(r"^gather issue roof"),
    re.compile(r"^per-dispatch round-trip"),
    re.compile(r"^\[.*\] \d+ rays in "),
    re.compile(r"^\[.*\] sdf bake:"),
    re.compile(r"^baked eval SDF grid"),
    re.compile(r"^sdf bake arm:"),
    # validate_ckpt.py
    re.compile(r"^loaded .* at step"),
    re.compile(r"^validate \("),
    # nan_repro.py provoke/minimize verdict lines
    re.compile(r"^(FAULT|PROVOKE|MINIMIZE|REPLAY|VERDICT)", re.I),
    re.compile(r"skipped_nonfinite"),
]
# context line printed right before each val so the step is recorded
STEP_RE = re.compile(r"^step (\d+)\[")


def scrape(log_path: str, raw: bool = False) -> str:
    kept = []
    last_step = None
    with open(log_path, errors="replace") as f:
        if raw:
            return f.read().rstrip("\n")
        for line in f:
            line = line.rstrip("\n")
            m = STEP_RE.match(line)
            if m:
                last_step = m.group(1)
            for pat in PATTERNS:
                if pat.match(line):
                    if line.startswith("val:") and last_step is not None:
                        line = f"val@step<= {last_step}: " + line[5:]
                    kept.append(line)
                    break
    return "\n".join(kept)


def main():
    log_path, tag = sys.argv[1], sys.argv[2]
    commit = "--no-commit" not in sys.argv
    body = scrape(log_path, raw="--raw" in sys.argv)
    if not body:
        return
    begin = f"<!-- BEGIN {tag} -->"
    end = f"<!-- END {tag} -->"
    section = f"{begin}\n## {tag}\n\n```\n{body}\n```\n{end}"
    if os.path.exists(RESULTS):
        text = open(RESULTS).read()
    else:
        text = HEADER
    if begin in text:
        pre = text.split(begin)[0]
        post = text.split(end, 1)[1] if end in text else ""
        new = pre + section + post
    else:
        new = text.rstrip("\n") + "\n\n" + section + "\n"
    if os.path.exists(RESULTS) and new == open(RESULTS).read():
        return
    with open(RESULTS, "w") as f:
        f.write(new)
    if commit:
        # --only semantics (explicit pathspec): commits RESULTS.md alone,
        # never whatever else happens to be staged or dirty
        subprocess.run(["git", "-C", REPO, "add", "RESULTS.md"], check=False)
        subprocess.run(
            ["git", "-C", REPO, "commit", "-q",
             "-m", f"Bank {tag} metrics (auto)",
             "-m", "No-Verification-Needed: doc-only metrics log",
             "--", "RESULTS.md"], check=False)


if __name__ == "__main__":
    main()
