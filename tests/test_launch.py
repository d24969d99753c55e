"""Device-kind launch-table dispatch (VERDICT r4 item 9 — the C3 analog
of the reference's GEMMul8_ARCH-keyed tables, common.hpp:11-20)."""

from gemmul8_tpu.pallas import launch


def test_v5e_kind_gets_tuned_profile():
    assert launch.get("matmul", kind="TPU v5 lite") == (1024, 512, 8192)
    assert launch.get("stats_ax1", kind="TPU v5e") == (512, 2048)
    assert launch.get("stats_ax0", kind="TPU v5 lite") == (1024, 2048)
    assert launch.get("rec_mxu", kind="TPU v5 lite") == (8, 4096)


def test_v6e_inherits_v5e_blocks():
    assert launch.get("matmul", kind="TPU v6 lite") == \
        launch.get("matmul", kind="TPU v5 lite")


def test_unknown_kind_gets_conservative_profile():
    blk = launch.get("matmul", kind="TPU v9 hyperchip")
    assert blk == (512, 512, 4096)
    # conservative second dims stay within the 16 MB default scoped VMEM:
    # matmul residency ~ (bm + bn) * bk bytes int8 + bm*bn*4 acc
    bm, bn, bk = blk
    assert (bm + bn) * bk + bm * bn * 4 <= 16 * 1024 * 1024
    assert launch.get("enc_mxu", kind="TPU v9 hyperchip") == (8, 2048)


def test_stats_chunk_is_pinned_across_profiles():
    """The reduction-chunk width is the shift's bit contract — every
    profile must agree on it (only row counts are tuning)."""
    for kind in ("TPU v5 lite", "TPU v6e", "TPU v9 hyperchip", "cpu"):
        assert launch.get("stats_ax1", kind=kind)[1] == launch.STATS_CHUNK
        assert launch.get("stats_ax0", kind=kind)[1] == launch.STATS_CHUNK


def test_current_backend_resolves():
    # on the CPU test backend this must resolve without touching TPU APIs
    assert launch.device_kind() == "cpu"
    assert isinstance(launch.get("matmul"), tuple)
