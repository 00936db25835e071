"""Reference-mount reconciliation gate (SURVEY.md §0 protocol).

The survey was written against an EMPTY ``/root/reference`` mount, so
every constant (channel counts, loss margins, rotation-set sizes,
near-native thresholds, sigma, resolution) is an educated guess.  The
moment the mount populates, those guesses must be reconciled against
the real tree — this script automates the detection and prints the
checklist.  It is run by tests/test_reference_gate.py on every CI
invocation, so a populated mount can never be silently ignored
(round-1 VERDICT "what's missing" #4).

Exit codes: 0 = mount empty (nothing to do) or RECONCILED.md exists;
            1 = mount populated and unreconciled -> fail loudly.
"""
from __future__ import annotations

import os
import subprocess
import sys

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECONCILED = os.path.join(REPO, "RECONCILED.md")

GREPS = [
    "VolumeConvolution", "TypedCoords2Volume", "Coords2TypedCoords",
    "Coords2RMSD", "EQRepresentation", "EQScoringModel", "EQDocker",
]

CHECKLIST = """\
CONSTANTS TO VERIFY against the now-populated reference tree
(then record findings in RECONCILED.md at the repo root):
  [ ] representation channel count C_rep (models/representation.py
      rep_features default; SURVEY §2.2 P1 guesses 16-48)
  [ ] conv stack depth / kernel size (EQRepresentation source)
  [ ] channel-coupling scheme: full matrix vs signs vs low-rank
      (EQScoringModel; models/scoring.py uses a full identity-init
      matrix + optional low-rank factorization)
  [ ] splat sigma + truncation window (TypedCoords2Volume kernel;
      config.sigma=1.0, splat_window=6)
  [ ] grid size L and resolution (config: 128 @ 1.25 A)
  [ ] rotation-set sizes: global (~13k?) and the local cone
      (angle, count)
  [ ] ranking-loss margin + near-native LRMSD threshold
      (config.hinge_margin=1.0, near_native_rmsd=5.0 A)
  [ ] decoy generation ranges (max angle 60 deg, max shift 12 A)
  [ ] 11-type atom table entries (structure/atom_types.py)
  [ ] CAPRI thresholds used for hits (utils/quality.py)
"""


def main() -> int:
    try:
        n_files = sum(len(fs) for _, _, fs in os.walk(REFERENCE))
    except OSError:
        n_files = 0
    if n_files == 0:
        print("reference mount empty: nothing to reconcile (SURVEY §0)")
        return 0
    if os.path.exists(RECONCILED):
        print(f"reference populated ({n_files} files); RECONCILED.md "
              f"present — reconciliation recorded.")
        return 0
    print(f"!! REFERENCE MOUNT POPULATED ({n_files} files) AND "
          f"UNRECONCILED !!", file=sys.stderr)
    print("Running SURVEY §0 grep protocol:", file=sys.stderr)
    pat = "|".join(GREPS)
    try:
        out = subprocess.run(
            ["grep", "-rln", "-E", pat, REFERENCE],
            capture_output=True, text=True, timeout=120)
        print(out.stdout or "(no symbol matches)", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"(grep failed: {e})", file=sys.stderr)
    print(CHECKLIST, file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
