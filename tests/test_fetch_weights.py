"""Weight-fetch tooling: offline behavior always tested; the actual
download + pretrained feature contract runs only where a network exists
(EDSNET_NETWORK_TESTS=1 — this CI box has zero egress)."""
import os

import numpy as np
import pytest

from edsnet_tpu import fetch_weights


def test_verify_reports_uncached(capsys):
    # on this box nothing is cached and there is no egress: --verify must
    # degrade to a readable report, not a crash
    rc = fetch_weights.main(["--verify", "--models", "google-net"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "not cached" in out


def test_known_urls_carry_hash_prefixes():
    for name, spec in fetch_weights.WEIGHTS.items():
        assert spec["url"].startswith("https://")
        if spec["sha256_prefix"] is not None:
            # torchvision convention: hash prefix embedded in the filename
            assert spec["sha256_prefix"] in spec["url"], name


@pytest.mark.skipif(os.environ.get("EDSNET_NETWORK_TESTS") != "1",
                    reason="needs network egress")
def test_fetch_and_extract_googlenet_features():
    assert fetch_weights.main(["--models", "google-net"]) == 0
    from edsnet_tpu.data.video import FeatureExtractor
    fe = FeatureExtractor("google-net")
    img = (np.random.RandomState(0).rand(240, 320, 3) * 255).astype(
        np.uint8)
    feat = fe.run(img)
    assert feat.shape == (1024,)
    np.testing.assert_allclose(np.linalg.norm(feat), 1.0, rtol=1e-4)
