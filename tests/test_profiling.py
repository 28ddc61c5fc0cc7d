

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
