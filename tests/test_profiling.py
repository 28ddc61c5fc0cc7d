

def test_fd_and_information_gain_reject_empty_input_lists(spark):
    """pairs=[] / feature_cols=[] is a caller bug: fail loud with
    ValueError instead of a bare IndexError from outs[0]
    (round-14 ADVICE fix)."""
    import pytest

    from maston_spark.profiling import fd_violations, information_gain

    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError, match="at least one"):
        fd_violations(df, [])
    with pytest.raises(ValueError, match="at least one"):
        information_gain(df, "a", [])


def test_information_gain_ranks_the_leaky_feature_first(spark):
    """A feature that restates the label has nmi 1 and tops the mi
    ranking; an independent feature sits near 0."""
    from maston_spark.profiling import information_gain

    rows = []
    for i in range(400):
        label = "pos" if i % 4 == 0 else "neg"
        # (i % 8) // 4 is exactly independent of (i % 4 == 0)
        rows.append((label, label.upper(), "c" + str((i % 8) // 4)))
    df = spark.createDataFrame(rows, "y string, leak string, coin string")
    out = {r.feature: r for r in information_gain(df, "y", ["leak", "coin"]).collect()}
    assert out["leak"].nmi == 1.0
    assert out["leak"].mi > out["coin"].mi
    assert abs(out["coin"].mi) < 1e-6
