"""CSVDataSource — the MusicBrainz CSV vertex reader.

Reference parity: ``io/impl/csv/MusicCSVToVertexFormatter.java:31-72`` maps a
10-column CSV row to a vertex with cleaned attributes; the cleaning rules
live in ``util/MusicUtils.java`` (fixSongLength / fixYear / fixLanguage) and
``util/Utils.java:760-785`` (createSimpleArtistTitleAlbum). Re-expressed as
Catalyst expressions over ``spark.read.csv`` — one scan, no Python.

The length/year fixers implement the reference's documented format grammar
(min+sec, decimal minutes, mm:ss, plain seconds/milliseconds; two-digit and
apostrophe years); the reference additionally hard-codes a handful of
single-record corrections for its 20k MusicBrainz dump ("28q666", …) which
are deliberately NOT reproduced — they are data patches, not semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MUSIC_CSV_SCHEMA = (
    "TID LONG, CID LONG, CTID LONG, SourceID INT, id STRING, number STRING, "
    "title STRING, length STRING, artist STRING, album STRING, year STRING, "
    "language STRING"
)


def fix_song_length(col: Column) -> Column:
    """MusicUtils.fixSongLength core grammar → seconds (int) or null:

    * ``NmMsec`` (e.g. ``4m32sec``)  → N*60 + M
    * ``D.D``   (decimal minutes)    → round(D.D * 60) HALF_UP
    * ``MM:SS``                      → MM*60 + SS
    * digits: trailing ``000`` or > 10000 are milliseconds → /1000 HALF_UP,
      else already seconds
    * anything else → null
    """
    s = F.regexp_replace(F.lower(col), r"\s+", "")
    s = F.translate(s, "olz", "012")  # common OCR-style digit typos
    ms = F.regexp_extract(s, r"^(\d+)m(\d+)sec$", 1).cast("int") * 60 + F.regexp_extract(
        s, r"^(\d+)m(\d+)sec$", 2
    ).cast("int")
    dec = F.floor(
        F.regexp_extract(s, r"^(\d+\.\d+)$", 1).cast("double") * 60 + F.lit(0.5)
    ).cast("int")
    mmss = F.regexp_extract(s, r"^(\d{1,2}):(\d{1,2})$", 1).cast("int") * 60 + F.regexp_extract(
        s, r"^(\d{1,2}):(\d{1,2})$", 2
    ).cast("int")
    digits = F.regexp_extract(s, r"^(\d+)$", 1)
    plain = F.when(
        (digits != "")
        & (digits.endswith("000") | (digits.cast("long") > 10000)),
        F.floor(digits.cast("double") / 1000 + 0.5).cast("int"),
    ).otherwise(digits.cast("int"))
    return (
        F.when(F.regexp_like(s, F.lit(r"^\d+m\d+sec$")), ms)
        .when(F.regexp_like(s, F.lit(r"^\d+\.\d+$")), dec)
        .when(F.regexp_like(s, F.lit(r"^\d{1,2}:\d{1,2}$")), mmss)
        .when(F.regexp_like(s, F.lit(r"^\d+$")), plain)
    )


def fix_year(col: Column) -> Column:
    """MusicUtils.fixYear: '11 → 2011, 04 → 2004, 86 → 1986, 4-digit kept
    (> 2017 → null), 4-digit substring of long strings extracted."""
    s = F.translate(F.regexp_replace(col, r"\s+", ""), "oO", "00")
    quoted = F.regexp_extract(s, r"^'(\d+)$", 1).cast("int")
    num = F.regexp_extract(s, r"^(\d+)$", 1).cast("int")
    embedded = F.regexp_extract(s, r"(\d{4})", 1).cast("int")

    def century(n: Column) -> Column:
        return (
            F.when(n < 20, n + 2000)
            .when(n <= 99, n + 1900)
            .when(n > 2017, F.lit(None))
            .otherwise(n)
        )

    return (
        F.when(F.regexp_like(s, F.lit(r"\d{5,}")), F.lit(None).cast("int"))
        .when(F.regexp_like(s, F.lit(r"^'\d+$")), century(quoted))
        .when(F.regexp_like(s, F.lit(r"^\d+$")), century(num))
        .when(
            (F.length(s) > 9) & F.regexp_like(s, F.lit(r"\d{4}")), embedded
        )
    )


def fix_language(col: Column) -> Column:
    """MusicUtils.fixLanguage prefix buckets; multiple → 'mu'."""
    lang = F.lower(col)
    return (
        F.when(lang.contains(","), F.lit("mu"))
        .when(lang.startswith("en"), F.lit("en"))
        .when(lang.startswith("ge"), F.lit("ge"))
        .when(lang.startswith("sp"), F.lit("sp"))
        .when(lang.startswith("it"), F.lit("it"))
        .when(lang.startswith("fr"), F.lit("fr"))
        .when(lang.startswith("la"), F.lit("la"))
        .when(lang.startswith("po"), F.lit("po"))
        .when(lang.startswith("hu"), F.lit("hu"))
        .otherwise(F.lit("no_or_minor_lang"))
    )


def simplify_music(col: Column) -> Column:
    """The reference's ``simplify`` (``util/Utils.java:832-838``): lowercase,
    ASCII punctuation -> space (``\\p{Punct}`` — accented letters are KEPT,
    unlike the transcript pipeline's alnum-only normalize), collapse
    whitespace runs, trim."""
    c = F.regexp_replace(F.lower(col), r"[\p{Punct}]", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _sane(col: Column) -> Column:
    """``Utils.isSane`` (``util/Utils.java:89-94``): null / "no_label_found"
    / "no_value" / "--" are not usable attribute values."""
    return col.isNotNull() & ~col.isin("no_label_found", "no_value", "--")


def read_music_csv(spark: SparkSession, path: str, sep: str = ",") -> DataFrame:
    """MusicBrainz CSV → vertex frame (rid, cid, source, number, label,
    length, artist, album, year, language, artist_title_album).

    ``artist_title_album`` follows ``Utils.createSimpleArtistTitleAlbum``
    (``util/Utils.java:760-788``): sane(artist) + sane(title) + sane(album)
    joined with spaces, then simplified (lowercase, punctuation -> space,
    collapsed) — "--" placeholders are dropped, accents kept."""
    raw = spark.read.csv(path, schema=MUSIC_CSV_SCHEMA, sep=sep, header=True)
    ata_parts = F.array(
        F.when(_sane(F.col("artist")), F.col("artist")),
        F.when(_sane(F.col("title")), F.col("title")),
        F.when(_sane(F.col("album")), F.col("album")),
    )
    ata = simplify_music(
        F.array_join(F.filter(ata_parts, lambda x: x.isNotNull()), " ")
    )
    return raw.select(
        F.col("TID").alias("rid"),
        F.col("CID").alias("cid"),
        F.col("SourceID").cast("string").alias("source"),
        F.col("number"),
        F.col("title").alias("label"),
        fix_song_length(F.col("length")).alias("length"),
        F.col("artist"),
        F.col("album"),
        fix_year(F.col("year")).alias("year"),
        fix_language(F.col("language")).alias("language"),
        ata.alias("artist_title_album"),
    )
