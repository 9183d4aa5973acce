"""Operator modules. Import the submodules directly, e.g.::

    from tablite_spark.operators import filters, joins
    from tablite_spark.operators.groupby import GroupBy, groupby

(Function names intentionally live in their submodules — several share
names with the modules themselves, e.g. ``groupby.groupby``.)
"""

from tablite_spark.operators import (  # noqa: F401
    expect, filters, frequency, fuzzy, groupby, imputation, joins,
    select, setops, sorting, stats, timeseries,
)
