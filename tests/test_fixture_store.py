"""fixture_store determinism: the committed sidecar must be reproducible
bit-for-bit from the generator — if regeneration drifts, the committed
oracle inputs and the Spark inputs could silently diverge."""

from __future__ import annotations

import filecmp
from pathlib import Path

from erigon_extract_spark import fixture_store


def test_regeneration_is_byte_identical(tmp_path):
    committed = fixture_store.ensure()
    fresh = tmp_path / "regen"
    fixture_store.generate_all(fresh)
    names = sorted(p.name for p in Path(committed).iterdir())
    assert names == sorted(p.name for p in fresh.iterdir())
    diff = [
        n for n in names
        if not filecmp.cmp(Path(committed) / n, fresh / n, shallow=False)
    ]
    assert diff == [], f"regenerated files differ: {diff}"
