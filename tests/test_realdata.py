"""Data-arrival automation (VERDICT r2 next-step #7): the fetch tool and
the one-command real-data pipeline must behave exactly right in BOTH
worlds — data absent (clean skip, exit 3, no TPU touched) and data
present (config resolves, pipeline proceeds)."""
import os

import pytest

from egonerf_tpu.tools.fetch_data import DATASETS, is_present, main as fetch_main
from egonerf_tpu.tools.real_data_run import config_for, main as run_main


def test_every_scene_has_a_config():
    """The fetcher's scene list and the checked-in config tree must agree
    one-to-one (22 scenes, reference: configs/EgoNeRF/**)."""
    assert len(DATASETS) == 22
    for scene in DATASETS:
        assert os.path.exists(config_for(scene)), scene


def test_absent_scene_detected(tmp_path):
    assert not is_present("barbershop", str(tmp_path))
    assert fetch_main(["barbershop", "--dest", str(tmp_path)]) == 3


def test_present_scene_detected(tmp_path):
    d = tmp_path / "OmniBlender" / "barbershop" / "images"
    d.mkdir(parents=True)
    assert is_present("barbershop", str(tmp_path))
    assert fetch_main(["barbershop", "--dest", str(tmp_path)]) == 0


def test_pipeline_skips_cleanly_without_data(tmp_path, capsys):
    rc = run_main(["barbershop", "--dest", str(tmp_path)])
    assert rc == 3
    assert "fetch_data" in capsys.readouterr().out


def test_unknown_scene_rejected(tmp_path):
    with pytest.raises(SystemExit):
        fetch_main(["no_such_scene", "--dest", str(tmp_path)])


@pytest.mark.skipif(
    not (os.environ.get("EGONERF_REAL_DATA") and is_present("barbershop")),
    reason="opt-in: needs EGONERF_REAL_DATA=1 and data/OmniBlender/barbershop")
def test_real_barbershop_short_run():
    """The day data arrives: a short end-to-end run through the real
    barbershop config (train -> eval -> results json)."""
    assert run_main(["barbershop", "--iters", "200"]) == 0
