"""Config honesty: every EncoderParams field is either consumed by the
pipeline (referenced outside params.py) or rejected loudly at validate()
— the round-1 review's dead-field rule."""

import dataclasses
import pathlib
import re

import pytest

from x264_tpu.params import EncoderParams

ROOT = pathlib.Path(__file__).resolve().parents[1] / "x264_tpu"

# fields whose non-default values are REJECTED at validate() until the
# capability lands (fail-loudly contract)
REJECTED = {
    "constrained_intra": True,
    "i16x16": False,
    "p16x16": False,
    "deadzone_intra": 7,
    "deadzone_inter": 7,
    "bit_depth": 10,
    "csp": 2,
    "annexb": False,
}
# accepted-for-compat fields documented as always-exhaustive
COMPAT = {"me_method"}


def _source_blob():
    txt = []
    for f in ROOT.rglob("*.py"):
        if f.name == "params.py":
            continue
        txt.append(f.read_text())
    return "\n".join(txt)


def test_every_field_consumed_or_rejected():
    blob = _source_blob()
    missing = []
    for f in dataclasses.fields(EncoderParams):
        if f.name in REJECTED or f.name in COMPAT:
            continue
        if not re.search(rf"\.{f.name}\b", blob):
            missing.append(f.name)
    assert not missing, f"dead EncoderParams fields: {missing}"


@pytest.mark.parametrize("name,value", sorted(REJECTED.items()))
def test_unimplemented_fields_fail_loudly(name, value):
    p = EncoderParams(width=64, height=48, **{name: value})
    with pytest.raises((NotImplementedError, AssertionError, ValueError)):
        p.validate()


@pytest.mark.parametrize("kw", [
    dict(slices=2),
    dict(i4x4=True),
])
def test_p8x8_pending_combos_fail_loudly(kw):
    """p8x8 is live for the device CAVLC/CABAC I/P/B combos; every
    pending combination must still be rejected, not silently ignored."""
    p = EncoderParams(width=64, height=48, p8x8=True, **kw)
    with pytest.raises(NotImplementedError):
        p.validate()
