"""Skip predicates — regex lists compiled into JVM `rlike` unions, or
user-supplied Python callables shipped as Arrow-vectorized pandas UDFs.

Reference: linksToSkip / fragmentsToSkip accept string[] | function
(/root/reference/src/options.ts:20,36-38; applied src/index.ts:937-971).
The regex path stays in whole-stage codegen; the callable path is the
documented UDF escape hatch (never per-row Spark Python).
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def make_skip_match(rules):
    """-> Callable[[Column], Column] | None for URL skip rules."""
    if rules is None:
        return None
    if callable(rules):
        fn = rules

        @pandas_udf("boolean")
        def _skip(urls: pd.Series) -> pd.Series:
            return urls.map(lambda u: bool(fn(u)))

        return lambda col: _skip(col)
    if not rules:
        return None
    patterns = list(rules)

    def match(col: Column) -> Column:
        return reduce(lambda a, b: a | b, (col.rlike(p) for p in patterns))

    return match


def make_fragment_skip_match(rules):
    """-> Callable[[Column fragment, Column url], Column] | None."""
    if rules is None:
        return None
    if callable(rules):
        fn = rules

        @pandas_udf("boolean")
        def _skip(frags: pd.Series, urls: pd.Series) -> pd.Series:
            return pd.Series([bool(fn(f, u)) for f, u in zip(frags, urls)])

        return lambda frag, url: _skip(frag, url)
    if not rules:
        return None
    patterns = list(rules)

    def match(frag: Column, _url: Column) -> Column:
        return reduce(lambda a, b: a | b, (frag.rlike(p) for p in patterns))

    return match
