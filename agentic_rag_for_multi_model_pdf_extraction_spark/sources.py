"""Sources: transcript synthesis and the documents-derived transcript table."""

from sparkx.graft import TRANSCRIPTS_SQL_CTE, transcripts_from_documents  # noqa: F401
from sparkx.schemas import EXTRACTED, METRICS, TRANSCRIPTS  # noqa: F401
from sparkx.synth import synth_pandas, synth_spark, write_transcripts_parquet  # noqa: F401
