"""Golden-log parity via the automated FP-diff harness.

Each case runs a reference regression input end-to-end and compares our
log's statistics blocks against the committed reference .log with the
reference's own tolerance (ref: tests/awk-fp-diff.sh TOLERANCE=1e-12,
tests/test-diff.sh filter rules).
"""

import pytest

from ludwig_tpu.utils.golden import check_case

# Cases at statistics-block parity (grown as coverage widens).
CASES = [
    "serial-elec-gc1",
    "serial-elec-eo1",
    "serial-elec-lj1",
    "serial-spin-fd1",
    "serial-drop-lc1",
    "serial-rect-ct1",
    "serial-rect-ct3",
    "serial-rect-ct4",
    "serial-le3d-st1",
    "serial-le3d-st5",
    "serial-le2d-fd1",
    "serial-dist-2kh",
    "serial-chol-st3",
    "serial-chol-st6",
]


@pytest.mark.parametrize("name", CASES)
def test_golden_stats_parity(name, tmp_path):
    ok, diffs, _ = check_case(name, mode="stats", workdir=str(tmp_path))
    assert ok, "FP-diff failures:\n" + "\n".join(diffs[:30])
