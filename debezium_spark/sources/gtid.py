"""MySQL GTID-set algebra + the read-only incremental-snapshot watermark
state machine.

The reference's read-only incremental snapshot replaces signal-table
watermark WRITES with two reads of ``@@gtid_executed`` (low watermark at
chunk-window open, high at close) and decides window membership by SET
CONTAINMENT, not scalar comparison — so a failover that switches the
server_uuid mid-stream (new interval family, transaction ids restarting
at 1) still closes windows correctly where a scalar position fence
provably cannot. Semantics re-derived from:

- ``GtidSet`` contract: debezium-connector-binlog/src/main/java/io/
  debezium/connector/binlog/gtid/GtidSet.java:15-61 (isEmpty /
  isContainedWithin / contains / retainAll / subtract / with).
- Interval algebra: debezium-connector-mysql/.../gtid/MySqlGtidSet.java
  (UUIDSet.subtract :404-416, Interval.remove/removeAll :478-511,
  ``with`` REPLACES same-uuid entries :110-122, ``subtract`` keeps
  uuids absent from the other set :133-149).
- Watermark state machine: debezium-connector-binlog/.../
  BinlogReadOnlyIncrementalSnapshotChangeEventSource.java:116-175 and
  MySqlReadOnlyIncrementalSnapshotContext (setHighWatermark subtracts
  the low one; updateWindowState opens past-low / closes past-high;
  hasServerIdentifierChanged = high watermark spans >1 server uuid and
  triggers a chunk re-read).

Everything here is DRIVER-SIDE bounded state: a gtid_executed set is a
few uuids with a handful of intervals, the same budget the reference
holds in its offset context. The distributed half (filtering millions of
events by watermark membership) renders the set as a Catalyst predicate
via :func:`gtid_membership_predicate` — a literal OR over intervals, no
join, no UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


def _merge(intervals: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort + merge overlapping/adjacent intervals (the binlog client
    normalizes '1-5:6-10' to '1-10' on parse)."""
    out: list[tuple[int, int]] = []
    for s, e in sorted(intervals):
        if s > e:
            raise ValueError(f"interval start {s} after end {e}")
        if out and s <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


@dataclass(frozen=True)
class GtidSet:
    """Immutable multi-source GTID set: uuid -> sorted disjoint
    transaction-id intervals."""

    uuids: tuple[tuple[str, tuple[tuple[int, int], ...]], ...]

    # -- construction -------------------------------------------------------
    @staticmethod
    def parse(text: str | None) -> "GtidSet":
        """'uuid:1-5:7,uuid2:1-3' (the @@gtid_executed text form).
        Whitespace/newlines tolerated like the reference's constructor."""
        if not text or not text.strip():
            return GtidSet(())
        by_uuid: dict[str, list[tuple[int, int]]] = {}
        for part in text.replace("\n", "").replace("\r", "").split(","):
            bits = part.strip().split(":")
            uuid, ranges = bits[0].lower(), bits[1:]
            if not ranges:
                raise ValueError(f"gtid set entry without intervals: {part!r}")
            ivs = by_uuid.setdefault(uuid, [])
            for r in ranges:
                s, _, e = r.partition("-")
                ivs.append((int(s), int(e) if e else int(s)))
        return GtidSet.of(by_uuid)

    @staticmethod
    def of(by_uuid: dict[str, list[tuple[int, int]]]) -> "GtidSet":
        # Normalize server uuids to lowercase HERE, not just in parse():
        # MySQL renders @@gtid_executed lowercase but clients may report
        # uppercase hex, and every lookup (contains/max_transaction_id)
        # lowercases — an uppercase key would silently never be found.
        norm: dict[str, list[tuple[int, int]]] = {}
        for u, ivs in by_uuid.items():
            norm.setdefault(u.lower(), []).extend(ivs)
        return GtidSet(tuple(
            (u, tuple(_merge(ivs)))
            for u, ivs in sorted(norm.items())
            if ivs
        ))

    def _map(self) -> dict[str, tuple[tuple[int, int], ...]]:
        return dict(self.uuids)

    # -- the GtidSet.java contract ------------------------------------------
    def is_empty(self) -> bool:
        return not self.uuids

    def contains(self, gtid: str) -> bool:
        """'uuid:txid' membership (MySqlGtidSet.contains)."""
        uuid, _, txid_s = gtid.partition(":")
        txid = int(txid_s)
        ivs = self._map().get(uuid.lower())
        return ivs is not None and any(s <= txid <= e for s, e in ivs)

    def is_contained_within(self, other: "GtidSet | None") -> bool:
        """Every interval of every uuid lies within SOME interval of the
        other set's same uuid (UUIDSet.isContainedWithin)."""
        if other is None:
            return False
        omap = other._map()
        for uuid, ivs in self.uuids:
            oivs = omap.get(uuid)
            if oivs is None:
                return False
            for s, e in ivs:
                if not any(os_ <= s and e <= oe for os_, oe in oivs):
                    return False
        return True

    def subtract(self, other: "GtidSet | None") -> "GtidSet":
        """Intervals of this set minus the other's, per uuid; uuids the
        other set doesn't know survive whole (MySqlGtidSet.subtract)."""
        if other is None:
            return self
        omap = other._map()
        out: dict[str, list[tuple[int, int]]] = {}
        for uuid, ivs in self.uuids:
            oivs = omap.get(uuid)
            if oivs is None:
                out[uuid] = list(ivs)
                continue
            remaining = list(ivs)
            for os_, oe in oivs:
                nxt: list[tuple[int, int]] = []
                for s, e in remaining:
                    if oe < s or os_ > e:       # nonintersecting
                        nxt.append((s, e))
                        continue
                    if s < os_:                  # head survives
                        nxt.append((s, os_ - 1))
                    if oe < e:                   # tail survives
                        nxt.append((oe + 1, e))
                remaining = nxt
            if remaining:
                out[uuid] = remaining
        return GtidSet.of(out)

    def with_(self, other: "GtidSet | None") -> "GtidSet":
        """The reference's ``with``: the other set's per-uuid entries
        REPLACE this set's (not an interval union — :110-122)."""
        if other is None or other.is_empty():
            return self
        merged = self._map()
        merged.update(other._map())
        return GtidSet.of({u: list(v) for u, v in merged.items()})

    def retain_all(self, predicate) -> "GtidSet":
        """Keep only uuids the predicate accepts (gtid source filters)."""
        if predicate is None:
            return self
        return GtidSet(tuple(
            (u, ivs) for u, ivs in self.uuids if predicate(u)
        ))

    def server_uuids(self) -> tuple[str, ...]:
        return tuple(u for u, _ in self.uuids)

    def max_transaction_id(self, uuid: str) -> int | None:
        ivs = self._map().get(uuid.lower())
        return max(e for _, e in ivs) if ivs else None

    def __str__(self) -> str:
        return ",".join(
            u + "".join(
                f":{s}-{e}" if s != e else f":{s}" for s, e in ivs
            )
            for u, ivs in self.uuids
        )


def gtid_membership_predicate(
    gtid_set: GtidSet, uuid_col: Column, txid_col: Column
) -> Column:
    """The distributed half: membership of (uuid, txid) columns in a
    driver-side watermark set, rendered as a literal interval OR —
    Catalyst-only, broadcast-free, join-free. A gtid_executed set is a
    few dozen literals at worst; the predicate rides the scan."""
    # The set normalizes server uuids to lowercase at parse time
    # (GtidSet.parse / of); compare case-insensitively so a stream whose
    # uuid column carries uppercase hex still matches the watermark window
    # (otherwise touched keys would never evict and the snapshot could emit
    # stale chunk rows over newer streamed values).
    uuid_lc = F.lower(uuid_col)
    pred = F.lit(False)
    for uuid, ivs in gtid_set.uuids:
        for s, e in ivs:
            pred = pred | (
                (uuid_lc == uuid) & txid_col.between(s, e)
            )
    return pred


class ReadOnlyWindow:
    """MySqlReadOnlyIncrementalSnapshotContext's watermark state machine:
    one chunk window of the read-only incremental snapshot.

    * ``open(executed)`` records the low watermark (gtid_executed at
      window open).
    * ``close(executed)`` records the high watermark MINUS the low one
      (setHighWatermark semantics) — the set of transactions committed
      strictly inside the window.
    * ``update_window_state(gtid)`` walks stream events: the window
      opens once the current GTID escapes the low watermark and closes
      (returns True) once it escapes the high one.
    * ``has_server_identifier_changed`` — the high watermark spans more
      than one server uuid: a failover happened inside the window and
      the chunk must be RE-READ (emitWindowClose -> rereadChunk).
    """

    def __init__(self) -> None:
        self.low: GtidSet | None = None
        self.high: GtidSet | None = None
        self.previous_low: GtidSet | None = None
        self.previous_high: GtidSet | None = None
        self.window_opened = False

    def open(self, executed: GtidSet) -> None:
        self.low = executed

    def close(self, executed: GtidSet) -> None:
        if self.low is None:
            raise ValueError("window closed before it was opened")
        self.high = executed.subtract(self.low)

    def update_window_state(self, current_gtid: str) -> bool:
        if not self.window_opened and self.low is not None:
            if not self.low.contains(current_gtid):
                self.window_opened = True
        if self.window_opened and self.high is not None:
            if not self.high.contains(current_gtid):
                self.close_window()
                return True
        return False

    def reached_high_watermark(self, current_gtid: str | None) -> bool:
        if self.high is None:
            return False
        if current_gtid is None:
            return True
        uuid, _, txid_s = current_gtid.partition(":")
        ref = self.high if self.high.uuids else self.low
        max_tx = ref.max_transaction_id(uuid) if ref else None
        return max_tx is not None and max_tx <= int(txid_s)

    def has_server_identifier_changed(self) -> bool:
        return self.high is not None and len(self.high.uuids) > 1

    def close_window(self) -> None:
        self.window_opened = False
        self.previous_high, self.high = self.high, None
        self.previous_low, self.low = self.low, None

    def watermarks_changed(self) -> bool:
        return (
            self.previous_low != self.low
            or self.previous_high != self.high
        )


# ---------------------------------------------------------------------------
# MariaDB flavor (the other GtidSetFactory implementation)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class MariaGtid:
    """One MariaDB GTID: domain-server-sequence (e.g. '0-27-42')."""

    domain: int
    server: int
    sequence: int

    @staticmethod
    def parse(text: str) -> "MariaGtid":
        d, s, q = text.strip().split("-")
        return MariaGtid(int(d), int(s), int(q))

    def __str__(self) -> str:
        return f"{self.domain}-{self.server}-{self.sequence}"


@dataclass(frozen=True)
class MariaDbGtidSet:
    """MariaDB GTID set: DISCRETE gtids grouped by (domain, server)
    stream — not interval families like MySQL (MariaDbGtidSet.java:30-137,
    MariaDbStreamSet :278-320). MariaDB tracks replication progress per
    DOMAIN, so containment compares per domain id only (debezium#1672,
    :70-80); subtract removes exact members per (domain, server) stream;
    ``with`` replaces same-stream entries."""

    streams: tuple[tuple[tuple[int, int], tuple[MariaGtid, ...]], ...]

    @staticmethod
    def parse(text: str | None) -> "MariaDbGtidSet":
        if not text or not text.strip():
            return MariaDbGtidSet(())
        by_stream: dict[tuple[int, int], set[MariaGtid]] = {}
        for part in text.replace("\n", "").split(","):
            g = MariaGtid.parse(part)
            by_stream.setdefault((g.domain, g.server), set()).add(g)
        return MariaDbGtidSet.of(by_stream)

    @staticmethod
    def of(by_stream: dict) -> "MariaDbGtidSet":
        return MariaDbGtidSet(tuple(
            (sid, tuple(sorted(gs, key=lambda g: g.sequence)))
            for sid, gs in sorted(by_stream.items())
            if gs
        ))

    def _map(self) -> dict:
        return dict(self.streams)

    def is_empty(self) -> bool:
        return not self.streams

    def contains(self, gtid: str) -> bool:
        g = MariaGtid.parse(gtid)
        return g in self._map().get((g.domain, g.server), ())

    def _for_domain(self) -> dict[int, set[MariaGtid]]:
        by_dom: dict[int, set[MariaGtid]] = {}
        for (d, _), gs in self.streams:
            by_dom.setdefault(d, set()).update(gs)
        return by_dom

    def is_contained_within(self, other: "MariaDbGtidSet | None") -> bool:
        """Per-DOMAIN containment: every stream's gtids all present in
        the other's same-domain set, or all at-or-before it
        (isContainedWith = containsAll || isAllBefore, :290-305)."""
        if other is None:
            return False
        odoms = other._for_domain()
        for (d, _), gs in self.streams:
            ogs = odoms.get(d)
            if ogs is None:
                return False
            if set(gs) <= ogs:
                continue
            if min(g.sequence for g in gs) > min(
                g.sequence for g in ogs
            ):
                return False
        return True

    def subtract(self, other: "MariaDbGtidSet | None") -> "MariaDbGtidSet":
        """Mirror MariaDbGtidSet.java:111-124: a stream whose gtids are
        contained-with the other's SAME stream — containsAll OR isAllBefore
        (min sequence <= the other's min, :290-305) — is dropped whole
        before the exact per-member subtract, so an all-before stream that
        still holds gtids the other lacks does not survive partially."""
        if other is None:
            return self
        omap = other._map()
        out: dict = {}
        for sid, gs in self.streams:
            ogs = omap.get(sid)
            if ogs is not None:
                oset = set(ogs)
                if set(gs) <= oset or (
                    min(g.sequence for g in gs)
                    <= min(g.sequence for g in ogs)
                ):
                    continue
            else:
                oset = set()
            rem = {g for g in gs if g not in oset}
            if rem:
                out[sid] = rem
        return MariaDbGtidSet.of(out)

    def with_(self, other: "MariaDbGtidSet | None") -> "MariaDbGtidSet":
        if other is None or other.is_empty():
            return self
        merged = {sid: set(gs) for sid, gs in self.streams}
        merged.update({sid: set(gs) for sid, gs in other.streams})
        return MariaDbGtidSet.of(merged)

    def retain_all(self, predicate) -> "MariaDbGtidSet":
        """Keep streams whose 'domain-server' filter value the predicate
        accepts (asSourceFilterValue, :231-233)."""
        if predicate is None:
            return self
        return MariaDbGtidSet(tuple(
            (sid, gs) for sid, gs in self.streams
            if predicate(f"{sid[0]}-{sid[1]}")
        ))

    def __str__(self) -> str:
        return ",".join(
            str(g) for _, gs in self.streams for g in gs
        )
