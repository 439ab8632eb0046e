"""Reference-compatible input schemas (the Sparkify datasets).

The reference declares these as DDL strings (/root/reference/schema.py:5-37)
with two semantic warts we fix internally: epoch-ms values declared FLOAT
(float32 destroys the low-order digits of ``registration``) and ``ts``
carried as BIGINT. We expose BOTH: the faithful declared schemas (for
fidelity tests) and corrected internal ones (DOUBLE + proper types).
"""

from __future__ import annotations

#: Faithful to the reference declaration (/root/reference/schema.py:5-24),
#: except FLOAT→DOUBLE as documented in SURVEY.md §1.2 (float32 corrupts
#: epoch-ms); fidelity tests cover the declared-FLOAT variant separately.
LOG_EVENTS_DDL = (
    "artist STRING, auth STRING, firstName STRING, gender STRING, "
    "itemInSession INT, lastName STRING, length DOUBLE, level STRING, "
    "location STRING, method STRING, page STRING, registration DOUBLE, "
    "sessionId INT, song STRING, status INT, ts BIGINT, userAgent STRING, "
    "userId STRING"
)

#: The reference's exact declared types (/root/reference/schema.py:5-24) —
#: FLOAT and all — for byte-compatible fidelity runs.
LOG_EVENTS_DECLARED_DDL = LOG_EVENTS_DDL.replace("DOUBLE", "FLOAT")

#: /root/reference/schema.py:26-37 (FLOAT→DOUBLE upgrade as above).
SONGS_DDL = (
    "num_songs INT, artist_id STRING, artist_latitude DOUBLE, "
    "artist_longitude DOUBLE, artist_location STRING, artist_name STRING, "
    "song_id STRING, title STRING, duration DOUBLE, year INT"
)

SONGS_DECLARED_DDL = SONGS_DDL.replace("DOUBLE", "FLOAT")
