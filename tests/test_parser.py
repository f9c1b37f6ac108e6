"""Parser golden-AST tests — one per statement form from the
reference's parser suite (tests/statement_test.c:422-450) and grammar
doc (src/statement_parse.h:33-142). No Spark session needed."""

from __future__ import annotations

import pytest

from raft_c_spark.frontend import ast
from raft_c_spark.frontend.ast import BinOp, Fn, ParseError, QueryFlags
from raft_c_spark.frontend.eval import eval_timeunit
from raft_c_spark.frontend.parser import parse


def test_createdb():
    assert parse("CREATEDB test-db") == ast.CreateDb("test-db")


def test_use():
    assert parse("USE test-db") == ast.Use("test-db")


def test_create_simple():
    s = parse("CREATE ts-test")
    assert s == ast.Create(ts_name="ts-test")


def test_create_retention_duplication():
    # tests/statement_test.c:36-56
    s = parse("CREATE ts-test 3d 'ignore'")
    assert isinstance(s, ast.Create)
    assert s.ts_name == "ts-test"
    assert s.retention == ast.TuSpan(3, "d")
    assert s.duplication == "ignore"


def test_create_update_duplication():
    s = parse("CREATE ts-test 'update'")
    assert s.duplication == "update"


def test_create_bad_duplication():
    with pytest.raises(ParseError):
        parse("CREATE ts-test 3d 'bogus'")


def test_delete_both_forms():
    assert parse("DELETE ts-test") == ast.Delete(name="ts-test", single=True)
    assert parse("DELETE ts-test FROM db0") == ast.Delete(
        name="ts-test", db_name="db0", single=False
    )


def test_meta_commands():
    assert parse(".databases") == ast.Meta("databases")
    assert parse(".TIMESERIES") == ast.Meta("timeseries")


def test_insert_single():
    s = parse("INSERT INTO cpu_usage VALUES (1643673600, 78.5)")
    assert s == ast.Insert(
        ts_name="cpu_usage",
        records=(ast.InsertRecord(ast.TuValue(1643673600), 78.5),),
    )


def test_insert_multi_and_generated_20():
    vals = ",".join(f"({1643673600 + i * 60}, {70 + i}.5)" for i in range(20))
    s = parse(f"INSERT INTO cpu_usage VALUES {vals}")
    assert isinstance(s, ast.Insert)
    assert len(s.records) == 20
    assert s.records[19].timeunit == ast.TuValue(1643673600 + 19 * 60)


def test_insert_date_literal():
    s = parse("INSERT INTO cpu_usage VALUES ('2023-01-01 12:30:00', 78.5)")
    assert s.records[0].timeunit == ast.TuDate("2023-01-01 12:30:00")
    # 2023-01-01T12:30:00Z epoch = 1672576200
    assert eval_timeunit(s.records[0].timeunit) == 1_672_576_200 * 10**9


def test_insert_now():
    s = parse("INSERT INTO cpu_usage VALUES (now(), 78.5)")
    assert s.records[0].timeunit == ast.TuFunc(Fn.NOW)


def test_insert_auto_timestamp():
    # VALUE form stamps current ns at parse time
    # (src/statement_parse.c:990-991)
    s = parse("INSERT INTO cpu_usage VALUE 78.5")
    assert isinstance(s.records[0].timeunit, ast.TuValue)
    assert s.records[0].timeunit.value > 1_600_000_000 * 10**9
    assert s.records[0].value == 78.5


def test_select_simple():
    s = parse("SELECT value FROM cpu_usage")
    assert isinstance(s, ast.Select)
    assert s.ts_name == "cpu_usage"
    assert s.flags == QueryFlags.BASE
    assert s.function is Fn.NONE


def test_select_full_surface():
    # tests/statement_test.c:193-226 shape
    s = parse(
        "SELECT records FROM ts-test BETWEEN 2382913 AND 39238293 "
        "WHERE test-value > 12.2 AND test-value < 16.2 SAMPLE BY 4d LIMIT 100"
    )
    assert isinstance(s, ast.Select)
    assert s.selector == ast.Interval(ast.TuValue(2382913), ast.TuValue(39238293))
    assert s.where == (
        ast.WhereCond("test-value", ">", 12.2),
        ast.WhereCond("test-value", "<", 16.2),
    )
    assert s.sampling == ast.TuSpan(4, "d")
    assert s.limit == 100
    assert s.flags == (
        QueryFlags.BASE
        | QueryFlags.RNGE
        | QueryFlags.COND
        | QueryFlags.SMPL
        | QueryFlags.LIMT
    )


def test_select_where_value_keyword_key():
    s = parse("SELECT value FROM t WHERE value > 1 AND value < 2")
    assert s.where == (
        ast.WhereCond("value", ">", 1.0),
        ast.WhereCond("value", "<", 2.0),
    )


def test_select_or_rejected():
    with pytest.raises(ParseError):
        parse("SELECT value FROM t WHERE value > 1 OR value < 2")


def test_select_aggregates():
    for fn in ("min", "max", "avg", "latest"):
        s = parse(f"SELECT {fn}(value) FROM cpu_usage BETWEEN 0 AND 10")
        assert s.function is Fn(fn)
        assert s.flags & QueryFlags.FUNC


def test_select_earliest_with_arg():
    s = parse("SELECT earliest(value, 10) FROM cpu_usage")
    assert s.function is Fn.EARLIEST
    assert s.fn_arg == 10


def test_select_date_literals():
    s = parse(
        "SELECT value FROM cpu_usage BETWEEN '2023-01-01 00:00:00' "
        "AND '2023-01-02 00:00:00'"
    )
    assert s.selector == ast.Interval(
        ast.TuDate("2023-01-01 00:00:00"), ast.TuDate("2023-01-02 00:00:00")
    )


def test_now_arithmetic_tree_shape():
    # tests/statement_test.c:378-420: now() - 2d
    s = parse("SELECT value FROM cpu_usage BETWEEN now() - 24h AND now()")
    start = s.selector.start
    assert start == ast.TuOps(ast.TuFunc(Fn.NOW), BinOp.SUB, ast.TuSpan(24, "h"))
    pinned = 1_700_000_000 * 10**9
    assert eval_timeunit(start, now=pinned) == pinned - 24 * 3600 * 10**9
    assert eval_timeunit(s.selector.end, now=pinned) == pinned


def test_timeunit_left_associative_chain():
    s = parse("SELECT value FROM t BETWEEN now() - 2d + 3h AND now()")
    start = s.selector.start
    assert isinstance(start, ast.TuOps) and start.op is BinOp.ADD
    assert isinstance(start.left, ast.TuOps) and start.left.op is BinOp.SUB


def test_exponent_floats():
    # tests/statement_test.c:345-376
    s = parse("SELECT value FROM t WHERE value > 2.5e-3 AND value < 2.5e3")
    assert s.where[0].value == 2.5e-3
    assert s.where[1].value == 2.5e3


def test_all_span_units():
    for unit, ns in [
        ("ns", 1),
        ("us", 10**3),
        ("ms", 10**6),
        ("s", 10**9),
        ("m", 60 * 10**9),
        ("h", 3600 * 10**9),
        ("d", 86400 * 10**9),
    ]:
        s = parse(f"SELECT value FROM t SAMPLE BY 7{unit}")
        assert eval_timeunit(s.sampling) == 7 * ns, unit


def test_mul_is_defined():
    # `*` multiplies two ns quantities (eval_op
    # src/statement_execute.c:158-170) — dimensionally odd but defined
    s = parse("SELECT value FROM t BETWEEN 2 * 3 AND 100")
    assert eval_timeunit(s.selector.start) == 6


def test_parse_errors():
    for bad in [
        "SELECT",
        "SELECT value",
        "SELECT value FROM",
        "INSERT INTO t",
        "INSERT INTO t VALUES (1,)",
        "CREATE",
        "FLY me TO the-moon",
        "SELECT value FROM t BETWEEN 1 AND",
    ]:
        with pytest.raises(ParseError):
            parse(bad)


def test_select_at_selector():
    s = parse("SELECT value FROM cpu AT 1643673600000000000")
    assert s.selector == ast.TuValue(1643673600000000000)
    assert s.flags & QueryFlags.RNGE


def test_select_at_with_expression():
    s = parse("SELECT value FROM cpu AT now() - 2d")
    assert isinstance(s.selector, ast.TuOps)


def test_multi_aggregate_golden():
    s = parse("SELECT min(value), max(value), avg(value) FROM cpu")
    assert s.functions == (Fn.MIN, Fn.MAX, Fn.AVG)
    assert s.function is Fn.MIN
    with pytest.raises(ParseError):
        parse("SELECT min(value), latest(value) FROM cpu")


def test_insert_star_golden():
    s = parse("INSERT INTO load VALUES (*, 12.2), (*, 19.2)")
    assert len(s.records) == 2
    assert all(isinstance(r.timeunit, ast.TuValue) for r in s.records)
    assert s.records[0].value == 12.2


def test_lexer_case_insensitive_keywords():
    s = parse("select value from cpu between 1 and 2 sample by 1h limit 5")
    assert s.ts_name == "cpu" and s.limit == 5


def test_identifiers_with_dots_and_dashes():
    s = parse("SELECT value FROM ts-test.v2")
    assert s.ts_name == "ts-test.v2"


def test_unterminated_literal():
    with pytest.raises(ParseError):
        parse("CREATE s 'unterminated")


def test_datetime_fractional_seconds():
    from raft_c_spark.functions.timefn import datetime_to_ns

    assert (
        datetime_to_ns("2023-01-01 12:30:00.000000123")
        == 1_672_576_200 * 10**9 + 123
    )
    with pytest.raises(ValueError):
        datetime_to_ns("2023-01-01 12:30:00.1234567890")  # >9 digits
    with pytest.raises(ValueError):
        datetime_to_ns("not-a-date")


def test_span_to_ns_unknown_unit():
    from raft_c_spark.functions.timefn import span_to_ns

    with pytest.raises(ValueError):
        span_to_ns(3, "weeks")


def test_trailing_input_rejected():
    with pytest.raises(ParseError):
        parse("USE db extra tokens here")
    with pytest.raises(ParseError):
        parse(".databases now")


def test_sample_by_fill_clause():
    from raft_c_spark.frontend.parser import parse

    s = parse("SELECT avg(value) FROM cpu SAMPLE BY 1h FILL(prev)")
    assert s.fill == "prev"
    assert parse("SELECT avg(value) FROM cpu SAMPLE BY 1h FILL(0.5)").fill == 0.5
    assert parse("SELECT avg(value) FROM cpu SAMPLE BY 1h FILL(null)").fill == "null"
    # fill only attaches to SAMPLE BY; default stays None
    assert parse("SELECT avg(value) FROM cpu SAMPLE BY 1h").fill is None


def test_sample_by_fill_rejects_bad_mode():
    import pytest

    from raft_c_spark.frontend.ast import ParseError
    from raft_c_spark.frontend.parser import parse

    with pytest.raises(ParseError):
        parse("SELECT avg(value) FROM cpu SAMPLE BY 1h FILL(bogus)")


def test_parser_total_over_arbitrary_input():
    """Fuzz totality (the wire-decoder property, applied to the
    language frontend): any input string either parses or raises
    ParseError — no IndexError/KeyError/ValueError escapes the
    tokenizer/parser on truncated statements, stray quotes, huge
    numerals, control bytes, or non-ASCII. Two layers: grammar-biased
    token soup (reaches deep parse states) and raw byte noise."""
    import random
    import string

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from raft_c_spark.frontend.ast import ParseError
    from raft_c_spark.frontend.parser import parse

    vocab = [
        "SELECT", "INSERT", "INTO", "CREATE", "CREATEDB", "USE",
        "DELETE", "FROM", "BETWEEN", "AND", "WHERE", "VALUES",
        "SAMPLE", "BY", "FILL", "AT", "LIMIT", "avg", "min", "max",
        "value", "timestamp", "now()", "(", ")", ",", ";", "'", "7d",
        "1h", "-", "+", "*", "9" * 25, "''", "\x00", "🦀", "\n",
        ".databases", "latest", "earliest",
    ]

    rng = random.Random(7)
    for _ in range(4000):
        q = " ".join(
            rng.choice(vocab) for _ in range(rng.randint(1, 8))
        )
        try:
            parse(q)
        except ParseError:
            pass

    @given(
        st.text(
            alphabet=string.printable + "🦀€\x00", max_size=30
        )
    )
    @settings(max_examples=300, deadline=None)
    def _bytes_noise(q):
        try:
            parse(q)
        except ParseError:
            pass

    _bytes_noise()
