"""CI gate: a populated reference mount cannot be silently ignored.

SURVEY.md §0: the survey was reconstructed against an EMPTY
``/root/reference``; its constants are guesses.  This test fails the
suite the moment the mount populates until RECONCILED.md records the
reconciliation (tools/check_reference.py prints the checklist)."""
import subprocess
import sys
import os

TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "check_reference.py")


def test_reference_mount_reconciled():
    r = subprocess.run([sys.executable, TOOL], capture_output=True,
                       text=True, timeout=180)
    assert r.returncode == 0, (
        "Reference mount is populated but unreconciled!\n"
        + r.stderr)
