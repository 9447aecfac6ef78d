"""Manifest hardening: cross-check key/shape manifests against the
ARCH PARAMS DOCUMENTED IN THE REFERENCE (not against our own port
code) — reference processors/pytorch_realesrgan.py:103-128 instantiates
RRDBNet(num_in_ch=3, num_out_ch=3, num_feat=64, num_block={23,6},
num_grow_ch=32, scale={2,4}). A manifest error shared by twin and port
would otherwise pass silently (PARITY.md "honest limitations")."""

import json
from pathlib import Path

import pytest

MANIFESTS = Path("framewright_tpu/models/manifests")

# (name, num_feat, num_block, num_grow_ch, scale) from the reference's
# model_configs table (pytorch_realesrgan.py:103-128)
RRDB_MODELS = [
    ("RealESRGAN_x4plus", 64, 23, 32, 4),
    ("RealESRGAN_x4plus_anime_6B", 64, 6, 32, 4),
    ("RealESRGAN_x2plus", 64, 23, 32, 2),
]


def expected_rrdb_shapes(nf, nb, gc, scale):
    """Derive the basicsr RRDBNet state-dict shapes from first
    principles: conv weights are (out, in, 3, 3); scale<4 routes input
    through pixel_unshuffle (in_ch * (4/scale)^2)."""
    in_ch = 3 * {4: 1, 2: 4, 1: 16}[scale]
    keys = {
        "conv_first.weight": [nf, in_ch, 3, 3], "conv_first.bias": [nf],
        "conv_body.weight": [nf, nf, 3, 3], "conv_body.bias": [nf],
        "conv_up1.weight": [nf, nf, 3, 3], "conv_up1.bias": [nf],
        "conv_up2.weight": [nf, nf, 3, 3], "conv_up2.bias": [nf],
        "conv_hr.weight": [nf, nf, 3, 3], "conv_hr.bias": [nf],
        "conv_last.weight": [3, nf, 3, 3], "conv_last.bias": [3],
    }
    for b in range(nb):
        for r in (1, 2, 3):
            for c in range(1, 6):
                cin = nf + (c - 1) * gc
                cout = gc if c < 5 else nf
                base = f"body.{b}.rdb{r}.conv{c}"
                keys[base + ".weight"] = [cout, cin, 3, 3]
                keys[base + ".bias"] = [cout]
    return keys


class TestManifestCrossCheck:
    @pytest.mark.parametrize("name,nf,nb,gc,scale", RRDB_MODELS)
    def test_rrdb_manifest_matches_reference_arch(self, name, nf, nb, gc,
                                                  scale):
        path = MANIFESTS / f"{name}.json"
        assert path.exists(), f"manifest missing for {name}"
        man = json.loads(path.read_text())["keys"]
        want = expected_rrdb_shapes(nf, nb, gc, scale)
        missing = set(want) - set(man)
        extra = set(man) - set(want)
        assert not missing, sorted(missing)[:5]
        assert not extra, sorted(extra)[:5]
        bad = {k: (man[k], want[k]) for k in want
               if list(man[k]) != list(want[k])}
        assert not bad, dict(list(bad.items())[:5])

    def test_manifest_count_matches(self):
        man = json.loads(
            (MANIFESTS / "RealESRGAN_x2plus.json").read_text())
        assert man["_meta"]["n_keys"] == len(man["keys"]) == 702
