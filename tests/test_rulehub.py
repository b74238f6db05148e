"""Rule-hub source (S9): publish/resolve round-trip, revision pinning,
content-hash integrity, validation, and Preset equivalence."""

import json
import os

import pytest

from latyas_spark.pipeline.presets import PAPER, PAPER_RULES
from latyas_spark.pipeline.rulehub import preset_from_hub, publish, resolve


def _paper_payload():
    return {
        "name": "paper",
        "n_detectors": 2,
        "rules": [list(r) for r in PAPER_RULES],
    }


def test_publish_resolve_roundtrip(tmp_path):
    hub = str(tmp_path)
    digest = publish(hub, "paper", "v1", _paper_payload())
    payload, got_digest = resolve(hub, "paper", "v1")
    assert got_digest == digest
    assert payload["rules"][0] == ["title", "ocr_paddle"]


def test_latest_pointer_and_pinning(tmp_path):
    hub = str(tmp_path)
    publish(hub, "paper", "v1", _paper_payload())
    v2 = _paper_payload()
    v2["rules"].append(["figure", "ocr_paddle"])
    publish(hub, "paper", "v2", v2)
    # latest follows the newest publish; pins still resolve
    latest, _ = resolve(hub, "paper")
    assert ["figure", "ocr_paddle"] in latest["rules"]
    pinned, _ = resolve(hub, "paper", "v1")
    assert ["figure", "ocr_paddle"] not in pinned["rules"]


def test_hub_preset_equivalent_to_builtin(tmp_path):
    hub = str(tmp_path)
    publish(hub, "paper", "v1", _paper_payload())
    p = preset_from_hub(hub, "paper", "v1")
    assert p == PAPER  # frozen dataclass: field-wise equality


def test_unknown_kind_rejected_at_publish(tmp_path):
    bad = _paper_payload()
    bad["rules"].append(["not-a-kind", "ocr_paddle"])
    with pytest.raises(ValueError, match="not in the engine kind registry"):
        publish(str(tmp_path), "paper", "v1", bad)
    # nothing became resolvable
    assert not os.path.exists(tmp_path / "paper" / "v1.json")


def test_tampered_artifact_fails_hash_then_validation(tmp_path):
    hub = str(tmp_path)
    digest = publish(hub, "paper", "v1", _paper_payload())
    path = tmp_path / "paper" / "v1.json"
    doc = json.loads(path.read_text())
    doc["rules"][0][1] = "ocr_other"
    path.write_text(json.dumps(doc, sort_keys=True, indent=1))
    _, new_digest = resolve(hub, "paper", "v1")
    assert new_digest != digest  # consumer comparing a pinned digest sees it
