

def test_registry_fixture_paths_resolve():
    """The fixture-reading queries resolve committed fixtures via
    REPO_ROOT (regression: the round-12 registry split silently broke
    __file__-relative paths — caught by the full sweep, pinned here
    so a future module move fails in pytest instead)."""
    import os

    from tablite_spark.registry._base import REPO_ROOT
    for rel in (("tests", "fixtures", "reference_table.tpz"),
                ("tests", "fixtures", "foreign_layout.h5")):
        p = os.path.join(REPO_ROOT, *rel)
        assert os.path.isfile(p), p
