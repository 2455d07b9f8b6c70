"""--testset ETH / WHU-TLS must auto-apply the reference's documented
per-dataset evaluation settings (Test.py:7-17, README.md:141-177) while
explicit flags always win."""

from roreg_tpu.cli.test import apply_testset_presets, get_parser


def _parse(argv):
    return apply_testset_presets(get_parser().parse_args(argv))


def test_eth_preset_applies():
    a = _parse(["--testset", "ETH"])
    assert a.voxel_size == 0.15
    assert a.ransac_d == 0.5
    assert a.tau_2 == 0.2
    assert a.tau_3 == 0.5


def test_whu_tls_preset_applies():
    a = _parse(["--testset", "WHU-TLS"])
    assert (a.voxel_size, a.ransac_d, a.tau_2, a.tau_3) == (
        0.15, 0.5, 0.2, 0.5
    )


def test_3dmatch_defaults():
    a = _parse(["--testset", "3dmatch"])
    assert (a.voxel_size, a.ransac_d, a.tau_2, a.tau_3) == (
        0.025, 0.1, 0.1, 0.2
    )


def test_explicit_flag_overrides_preset():
    a = _parse(["--testset", "ETH", "--voxel_size", "0.3", "--tau_2", "0.4"])
    assert a.voxel_size == 0.3
    assert a.tau_2 == 0.4
    assert a.ransac_d == 0.5  # untouched preset fields still apply
