from hypo_tpu import config


def test_get_kmer_len_matches_reference_arithmetic():
    # reference main.cpp:490-528: k = (power + ceil(log2 v)) // 2, bump odd
    assert config.get_kmer_len("4.6m") == 11   # 20+3=23 -> 11 (odd)
    assert config.get_kmer_len("3g") == 17     # 30+2=32 -> 16 -> 17
    assert config.get_kmer_len("1000") == 5    # 0+10=10 -> 5 (odd)
    assert config.get_kmer_len("12m") == 13    # 20+4=24 -> 12 -> 13
    assert config.get_kmer_len("2") == 2       # floor at 2 (main.cpp:172)


def test_get_expected_file_sz_clamps():
    assert config.get_expected_file_sz("4.6m", 50) == 12   # below floor
    assert config.get_expected_file_sz("3g", 60) == 360
    assert config.get_expected_file_sz("3g", 500) == 1024  # above cap


def test_set_kind():
    flags = config.InputFlags(kind="ccs")
    assert flags.window_settings.ideal_swind_size == 500
    assert flags.window_settings.wind_size_search_th == 400
    legacy = config.InputFlags(kind="ccs", legacy_dead_set_kind=True)
    assert legacy.window_settings.ideal_swind_size == 100
