"""YouTube video-id extraction (SURVEY §2.8 O10).

Reference: scripts/fetch_youtube_transcripts.py:58-69 tries three
regexes in order — the boundary-anchored catch-all
``(?:v=|/)(id11)(?:[?&#/]|$)`` FIRST, then ``/embed/``, then
``youtu.be/`` — each capturing an 11-char id.  The catch-all requires
a ``[?&#/]`` or end-of-string boundary after the id, so e.g. a 12-char
run after ``v=`` matches nothing; the embed/short patterns have no
trailing boundary in the reference and keep that behavior.  Pure
``regexp_extract`` columns here (JVM-side, whole-stage codegen), no
UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ID = "([0-9A-Za-z_-]{11})"
_PATTERNS = [
    rf"(?:v=|/){_ID}(?:[?&#/]|$)",  # reference VIDEO_ID_RE, tried first
    rf"/embed/{_ID}",
    rf"youtu\.be/{_ID}",
]


def video_id(url: Column) -> Column:
    """First matching 11-char YouTube id, else NULL."""
    out = F.lit(None).cast("string")
    for pat in reversed(_PATTERNS):
        cand = F.nullif(F.regexp_extract(url, pat, 1), F.lit(""))
        out = F.coalesce(cand, out)
    return out
