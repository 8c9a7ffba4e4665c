from mapping_analysis_spark.data.transcripts import (  # noqa: F401
    ensure_transcripts,
    generate_transcripts,
    transcripts_path,
)
