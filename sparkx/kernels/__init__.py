"""Pure pandas/numpy kernels — NO Spark imports.

Each kernel is a plain function over ``pd.DataFrame``/``pd.Series`` so it
unit-tests without a SparkSession and is wrapped by ``mapInPandas`` in exactly
one place (``sparkx.pipeline``).  Every operation inside is a vectorized
pandas/numpy batch op (``str.*``, ``groupby``, boolean masks) — no
row-at-a-time Python in the hot path (north_rule requirement).
"""

from sparkx.kernels.blocks import parse_blocks  # noqa: F401
from sparkx.kernels.extract import extract_batch  # noqa: F401
