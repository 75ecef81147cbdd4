"""Egress-gated dataset fetcher for the EgoNeRF benchmark scenes.

The upstream datasets (OmniBlender + Ricoh360, reference: README.md:8,26)
are distributed via a Google Drive folder.  This image has zero network
egress, so the tool's job is to (a) succeed instantly when the data is
already on disk, (b) attempt a download through whichever client is
available (gdown, then a plain-HTTP fallback), and (c) fail with precise
manual instructions instead of a stack trace when the network is walled
off — so the day data can arrive, `tools/real_data_run` works with zero
new code.

Usage:  python -m egonerf_tpu.tools.fetch_data [scene] [--dest data]
Exit codes: 0 data present (already or fetched), 3 unreachable (egress).
"""
from __future__ import annotations

import os
import sys

DRIVE_FOLDER = "1kqLAATjSSDwfLHI5O7RTfM9NOUi7PvcK"  # reference: README.md:8
DATASETS = {
    # scene -> collection dir; exactly the 11+11 scenes under
    # configs/egonerf/{omniblender,ricoh}/
    **{s: "OmniBlender" for s in (
        "barbershop", "lone_monk", "archiviz-flat", "classroom", "restroom",
        "bistro_bike", "bistro_square", "fisher-hut", "LOU",
        "pavilion_midday_chair", "pavilion_midday_pond")},
    **{s: "Ricoh360" for s in (
        "bricks", "bridge", "bridge_under", "cat_tower", "center", "farm",
        "flower", "garden", "gallery_chair", "gallery_pillar", "poster")},
}


def scene_dir(scene: str, dest: str = "data") -> str:
    return os.path.join(dest, DATASETS[scene], scene)


def is_present(scene: str, dest: str = "data") -> bool:
    """A usable scene has images/ and a trajectory file (the loaders'
    on-disk contract, data/datasets.py:108-190)."""
    d = scene_dir(scene, dest)
    if not os.path.isdir(d):
        return False
    entries = set(os.listdir(d))
    return bool(entries & {"images", "image", "transforms.json",
                           "cam_models", "poses"})


def try_fetch(scene: str, dest: str = "data") -> bool:
    """Best-effort download; True only if the scene is present after."""
    target = scene_dir(scene, dest)
    try:
        import gdown  # type: ignore

        os.makedirs(os.path.dirname(target), exist_ok=True)
        gdown.download_folder(id=DRIVE_FOLDER, output=os.path.dirname(target),
                              quiet=False)
    except ImportError:
        print("gdown not installed; trying plain HTTP probe", file=sys.stderr)
        try:
            import urllib.request

            urllib.request.urlopen(
                "https://drive.google.com/drive/folders/" + DRIVE_FOLDER,
                timeout=10)
            print("Drive reachable but folder download needs gdown — "
                  "`pip install gdown` and re-run.", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — egress walled off
            print(f"network unreachable ({type(e).__name__}: {e})",
                  file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"download failed ({type(e).__name__}: {e})", file=sys.stderr)
    return is_present(scene, dest)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    dest = "data"
    if "--dest" in argv:
        i = argv.index("--dest")
        dest = argv[i + 1]
        del argv[i:i + 2]
    scene = argv[0] if argv else "barbershop"
    if scene not in DATASETS:
        raise SystemExit(f"unknown scene {scene!r}; one of {sorted(DATASETS)}")

    if is_present(scene, dest):
        print(f"{scene_dir(scene, dest)}: present")
        return 0
    if try_fetch(scene, dest):
        print(f"{scene_dir(scene, dest)}: fetched")
        return 0
    print(f"""\
{scene_dir(scene, dest)}: ABSENT and not fetchable from this machine.
Manual path: download the '{DATASETS[scene]}' collection from
  https://drive.google.com/drive/folders/{DRIVE_FOLDER}
(reference: README.md) and unpack so that {scene_dir(scene, dest)}/ holds
the scene's images + trajectory files.  Then re-run — every real-data
tool keys off that directory existing.""")
    return 3


if __name__ == "__main__":
    raise SystemExit(main())
