"""Versioned rule/config artifact store: the model-hub source (S9).

The reference resolves every model and its config by name+revision
from the Hugging Face hub, with a local path winning when it exists
(ultralytics_layout_model.py:36-52 ``from_pretrained(name_or_path,
revision)`` / ``hf_hub_download``; paper_pipeline.py:36 pins an exact
revision hash for GOT-OCR2).  In the span engine the model weights are
deterministic stand-ins, so what remains hub-worthy is the CONFIG
artifact: the per-preset kind->model rule table and detector count
that drive the J4 dispatch join and the flagship's sidecar union.

This module is that source, Spark-shaped:

* artifacts are plain JSON files under ``<hub>/<name>/<revision>.json``
  with a ``latest`` pointer file — resolution mirrors the reference's
  semantics (local-path-wins, pinnable revision, 'latest' default);
* ``publish`` writes atomically (temp + rename) and returns the
  artifact's sha256, which ``resolve`` re-verifies on read — a torn or
  hand-edited artifact fails loudly, never silently misroutes blocks;
* the loaded table is validated against the engine's kind registry
  BEFORE it reaches executors (an unknown kind raises at resolve time
  on the driver, not mid-task on executor 713 of 1000);
* consumers get a :class:`~latyas_spark.pipeline.presets.Preset`; the
  rule table itself travels to executors as a broadcast dimension of
  the J4 dispatch join (registry.q_ocr_route), never as a shuffle.

At warehouse scale the hub directory lives on shared storage (HDFS/
object store — same places ``spark-submit --py-files`` artifacts go);
the files are a few hundred bytes, read once per driver.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Tuple

from ..core import blocktypes as bt
from .presets import Preset, _mk

_SCHEMA_KEYS = {"name", "n_detectors", "rules"}


def _artifact_bytes(payload: dict) -> bytes:
    # canonical serialization => the sha256 is content-defined, not
    # formatting-defined
    return json.dumps(payload, sort_keys=True, indent=1).encode("utf-8")


def publish(
    hub_dir: str, name: str, revision: str, payload: dict
) -> str:
    """Write a rule artifact at ``<hub>/<name>/<revision>.json``,
    update the ``latest`` pointer, and return its sha256.  Validates
    BEFORE writing so a bad table can never become resolvable."""
    _validate(name, payload)
    d = os.path.join(hub_dir, name)
    os.makedirs(d, exist_ok=True)
    data = _artifact_bytes(payload)
    digest = hashlib.sha256(data).hexdigest()
    for fname, body in (
        (f"{revision}.json", data),
        ("latest", f"{revision}\n".encode()),
    ):
        fd, tmp = tempfile.mkstemp(dir=d)
        with os.fdopen(fd, "wb") as f:
            f.write(body)
        os.replace(tmp, os.path.join(d, fname))
    return digest


def _validate(name: str, payload: dict) -> None:
    missing = _SCHEMA_KEYS - set(payload)
    if missing:
        raise ValueError(f"rule artifact {name!r} missing keys {sorted(missing)}")
    if payload["name"] != name:
        raise ValueError(
            f"artifact name {payload['name']!r} != requested {name!r}"
        )
    if not isinstance(payload["n_detectors"], int) or payload["n_detectors"] < 1:
        raise ValueError("n_detectors must be a positive int")
    for entry in payload["rules"]:
        if not (isinstance(entry, (list, tuple)) and len(entry) == 2):
            raise ValueError(f"rule entry {entry!r} is not a [kind, model] pair")
        kind, model = entry
        if kind not in bt.KIND_CODES:
            raise ValueError(
                f"rule kind {kind!r} not in the engine kind registry "
                f"(known: {sorted(bt.KIND_CODES)})"
            )
        if not model or not isinstance(model, str):
            raise ValueError(f"rule model for kind {kind!r} must be a non-empty string")


def resolve(
    hub_dir: str, name: str, revision: str = "latest"
) -> Tuple[dict, str]:
    """Load and validate the artifact; returns ``(payload, sha256)``.
    ``revision='latest'`` follows the pointer file (the reference's
    default ``revision='main'``); any other value is a pin."""
    d = os.path.join(hub_dir, name)
    if revision == "latest":
        with open(os.path.join(d, "latest")) as f:
            revision = f.read().strip()
    path = os.path.join(d, f"{revision}.json")
    with open(path, "rb") as f:
        data = f.read()
    payload = json.loads(data)
    _validate(name, payload)
    digest = hashlib.sha256(_artifact_bytes(payload)).hexdigest()
    return payload, digest


def preset_from_hub(
    hub_dir: str, name: str, revision: str = "latest"
) -> Preset:
    """Resolve a rule artifact into a runnable :class:`Preset` (same
    object the built-in paper/report/book presets are)."""
    payload, _ = resolve(hub_dir, name, revision)
    return _mk(
        payload["name"],
        payload["n_detectors"],
        tuple((k, m) for k, m in payload["rules"]),
    )
