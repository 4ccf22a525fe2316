"""Batch naming (O33).

The reference stamps every run with a US/Eastern timestamp that names
the S3 upload subfolders (`cds-transformation_v1.3.py:114-115`:
``datetime.datetime.now(tz=eastern).strftime("%Y-%m-%dT%H%M%S")``).
Same contract here: one stamp per run, taken once at driver start, so
every artifact of a batch shares one version string.
"""

from __future__ import annotations

import datetime


def _eastern():
    try:
        from zoneinfo import ZoneInfo

        return ZoneInfo("America/New_York")
    except Exception:  # pragma: no cover - zoneinfo/tzdata always present here
        try:
            import dateutil.tz

            return dateutil.tz.gettz("US/Eastern")
        except Exception:
            return datetime.timezone.utc


def batch_timestamp(now: datetime.datetime | None = None) -> str:
    """``%Y-%m-%dT%H%M%S`` in US/Eastern — the reference's batch
    version string (sortable, filesystem/S3-key safe: no colons)."""
    if now is None:
        now = datetime.datetime.now(tz=_eastern())
    elif now.tzinfo is not None:
        now = now.astimezone(_eastern())
    return now.strftime("%Y-%m-%dT%H%M%S")
