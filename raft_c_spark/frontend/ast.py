"""Dataclass AST for the query language — a faithful Python mirror of
the reference's ``stmt_t`` tagged union (src/statement_parse.h:145-315),
so parser golden tests can assert the same fields the reference's
parser suite does (tests/statement_test.c)."""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class Fn(enum.Enum):
    """function_t (src/statement_parse.h:146) + the grammar-doc-only
    ``earliest`` (src/statement_parse.h:103) which we implement."""

    NONE = "none"
    AVG = "avg"
    MIN = "min"
    MAX = "max"
    NOW = "now"
    LATEST = "latest"
    EARLIEST = "earliest"


class BinOp(enum.Enum):
    """binary_op_t (src/statement_parse.h:163)."""

    ADD = "+"
    SUB = "-"
    MUL = "*"


class QueryFlags(enum.IntFlag):
    """query_flags_t (src/statement_parse.h:248-255)."""

    BASE = 1 << 0
    RNGE = 1 << 1
    FUNC = 1 << 2
    COND = 1 << 3
    SMPL = 1 << 4
    LIMT = 1 << 5


# --- time-unit expression tree (stmt_timeunit_t) ---------------------------


@dataclass(frozen=True)
class TuValue:
    """Integer literal timestamp — caller-supplied epoch (TU_VALUE)."""

    value: int


@dataclass(frozen=True)
class TuDate:
    """'YYYY-MM-DD[ HH:MM:SS[.frac]]' literal (TU_DATE)."""

    date: str


@dataclass(frozen=True)
class TuFunc:
    """now() (TU_FUNC)."""

    fn: Fn = Fn.NOW


@dataclass(frozen=True)
class TuSpan:
    """Timespan literal, e.g. 3ms / 2d (TU_SPAN)."""

    value: int
    unit: str


@dataclass(frozen=True)
class TuOps:
    """Binary arithmetic over timeunits (TU_OPS)."""

    left: "TimeUnit"
    op: BinOp
    right: "TimeUnit"


TimeUnit = TuValue | TuDate | TuFunc | TuSpan | TuOps


@dataclass(frozen=True)
class Interval:
    """S_INTERVAL selector (stmt_selector_t)."""

    start: TimeUnit
    end: TimeUnit


@dataclass(frozen=True)
class WhereCond:
    """One comparison in the WHERE chain (where_clause_t). Key is
    free-form; ``timestamp`` targets the time column, anything else the
    value column (SURVEY §1.3)."""

    key: str
    op: str  # = != > >= < <=
    value: float


# --- statements ------------------------------------------------------------


@dataclass(frozen=True)
class CreateDb:
    db_name: str


@dataclass(frozen=True)
class Use:
    db_name: str


@dataclass(frozen=True)
class Create:
    ts_name: str
    db_name: str = ""
    retention: TimeUnit | None = None
    duplication: str | None = None  # 'ignore' | 'insert'


@dataclass(frozen=True)
class Delete:
    """single=True: DELETE name (drop series, or db when no series of
    that name); DELETE ts FROM db otherwise (stmt_delete_t)."""

    name: str
    db_name: str = ""
    single: bool = True


@dataclass(frozen=True)
class InsertRecord:
    timeunit: TimeUnit
    value: float


@dataclass(frozen=True)
class Insert:
    ts_name: str
    records: tuple[InsertRecord, ...]
    db_name: str = ""


@dataclass(frozen=True)
class Select:
    ts_name: str
    selector: Interval | TimeUnit | None = None
    where: tuple[WhereCond, ...] = ()
    function: Fn = Fn.NONE
    fn_arg: int | None = None  # earliest(value, n)
    #: multi-aggregate form `SELECT min(value), max(value), avg(value)`
    #: (grammar doc src/statement_parse.h:97 — parser-unsupported in the
    #: reference, implemented here); when non-empty, ``function`` holds
    #: the first entry
    functions: tuple[Fn, ...] = ()
    sampling: TimeUnit | None = None
    #: SAMPLE BY ... FILL(prev|null|<number>) — grammar extension (the
    #: reference has no fill; modern-TSDB surface, see
    #: operators/tsdb.sample_by_fill): "prev", "null", or a float
    fill: str | float | None = None
    limit: int | None = None
    flags: QueryFlags = QueryFlags(0)


@dataclass(frozen=True)
class Meta:
    command: str  # 'databases' | 'timeseries'


Statement = CreateDb | Use | Create | Delete | Insert | Select | Meta


class ParseError(ValueError):
    def __init__(self, msg: str, pos: int = -1):
        super().__init__(msg)
        self.pos = pos
