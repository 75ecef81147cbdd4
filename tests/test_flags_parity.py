"""Every CLI flag the reference defines must resolve in this framework's
config system (skipped without the reference checkout)."""
import os
import re

import pytest

REF_OPT = "/root/reference/opt.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_OPT),
                                reason="reference checkout not present")


def reference_flags():
    text = open(REF_OPT).read()
    names = re.findall(r"add_argument\(\s*['\"]--([A-Za-z0-9_]+)['\"]", text)
    assert len(names) > 60, "flag extraction looks broken"
    return names


def test_all_reference_flags_resolve():
    from egonerf_tpu.train.config import _resolve_key

    missing = []
    for name in reference_flags():
        try:
            _resolve_key(name)
        except KeyError:
            missing.append(name)
    assert not missing, f"reference flags without a config counterpart: {missing}"


def test_reference_config_files_parse():
    """Every shipped reference scene config parses through our include-chain
    loader (the dialects must stay compatible)."""
    import glob

    from egonerf_tpu.train.config import load_config

    leafs = glob.glob("/root/reference/configs/EgoNeRF/**/default.txt", recursive=True)
    assert len(leafs) >= 20
    for leaf in leafs:
        cfg = load_config(leaf)
        assert cfg.coordinates_name == "yinyang"
        assert cfg.model_name == "EgoNeRF"
        assert cfg.resampling and cfg.interval_th
