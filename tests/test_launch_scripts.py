"""The shell launch-script surface (scripts/sh/*.sh).

Mirrors the reference's v2/scripts/*.sh + v1/scripts/*.sh entry points
(e.g. /root/reference/v2/scripts/train_dist_TVTSv2_ViT_B_16.sh): every
script must reference an existing python driver and config file so the
README reproduction commands stay paste-able.
"""

import os
import re
import subprocess

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
SH_DIR = os.path.join(REPO, "scripts", "sh")
SCRIPTS = sorted(f for f in os.listdir(SH_DIR) if f.endswith(".sh"))

# the reference's launch surface, one .sh here per reference .sh
REFERENCE_NAMES = (
    ["train_dist_TVTSv2_ViT_%s.sh" % s for s in ("B_16", "B_32", "H_14")]
    + ["zero_ret_%s_TVTSv2_ViT_%s.sh" % (d, s)
       for d in ("msrvtt", "didemo", "lsmdc")
       for s in ("B_16", "B_32", "H_14")]
    + ["zero_recognition_%s_TVTSv2_ViT_%s.sh" % (d, s)
       for d in ("hmdb51", "ucf101", "k400")
       for s in ("B_16", "B_32", "H_14")]
    + ["zero_ssv2_mc_TVTSv2_ViT_%s.sh" % s for s in ("B_16", "B_32", "H_14")]
    + ["train_yt.sh", "train_cc_web.sh", "ft_ssv2.sh", "linear_ssv2.sh",
       "zero_ssv2.sh"])


def test_reference_surface_complete():
    missing = [n for n in REFERENCE_NAMES if n not in SCRIPTS]
    assert not missing, f"launch scripts missing vs reference: {missing}"


@pytest.mark.parametrize("name", SCRIPTS)
def test_script_targets_exist(name):
    body = open(os.path.join(SH_DIR, name)).read()
    driver = re.search(r"python (scripts/\S+\.py)", body)
    assert driver, f"{name}: no python driver invocation"
    assert os.path.exists(os.path.join(REPO, driver.group(1))), \
        f"{name}: driver {driver.group(1)} does not exist"
    cfg = re.search(r"--config (\S+\.json)", body)
    if cfg:
        assert os.path.exists(os.path.join(REPO, cfg.group(1))), \
            f"{name}: config {cfg.group(1)} does not exist"
    subprocess.run(["bash", "-n", os.path.join(SH_DIR, name)], check=True)


def test_scripts_executable():
    for name in SCRIPTS:
        assert os.access(os.path.join(SH_DIR, name), os.X_OK), name
