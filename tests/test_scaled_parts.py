"""Cluster-derived execution knobs (config.scaled_parts / scaled_pool).

The contract: every tuned constant in the repo is the 32-cpu dev-box
special case; on a bigger cluster the fanout grows linearly with total
CPUs so per-core partition size stays constant, and it never drops below
the tuned base on smaller boxes (bench layouts unchanged at <=32 cpus).
"""
from unittest import mock

from pdf_watermark_removal_otsu_inpaint_ray import config as cfg


def test_explicit_value_wins():
    assert cfg.scaled_parts(64, 7) == 7
    assert cfg.scaled_parts(16, 1) == 1


def test_floor_at_base_on_small_boxes(ray_session):
    # the pytest session runs at num_cpus=4: every default must stay at
    # its tuned base so golden layouts and bench numbers are unchanged
    assert cfg.cluster_cpus() == 4
    assert cfg.scaled_parts(64) == 64
    assert cfg.scaled_parts(16) == 16
    assert cfg.scaled_pool(1, 4) == (1, 4)


def test_linear_scaling_with_cluster_cpus():
    with mock.patch.object(cfg, "cluster_cpus", return_value=32 * 256):
        # a 256-node x 32-cpu cluster: 256x the fanout, same bytes/core
        assert cfg.scaled_parts(64) == 64 * 256
        assert cfg.scaled_parts(16) == 16 * 256
        assert cfg.scaled_pool(2, 8) == (2, 8 * 256)
    with mock.patch.object(cfg, "cluster_cpus", return_value=48):
        assert cfg.scaled_parts(64) == 96  # 64 * 48 // 32


def test_uninitialised_ray_falls_back_to_reference_box():
    # driver-side planning without a Ray session sees the 32-cpu default
    with mock.patch("ray.is_initialized", return_value=False):
        assert cfg.cluster_cpus() == 32
        assert cfg.scaled_parts(64) == 64
