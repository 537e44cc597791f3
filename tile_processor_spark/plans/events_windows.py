"""Event-stream window aggregations (tumbling / sliding / session) and
as-of joins over the `events` table.
"""

from __future__ import annotations
