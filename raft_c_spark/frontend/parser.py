"""Recursive-descent parser: token stream → dataclass AST.

Mirrors the reference's parser structure (parse_select / parse_insert /
parse_create / parse_delete / parse_where / parse_timeunit,
src/statement_parse.c:455-1197) including its grammar quirks:

- WHERE chains are AND-only, right-leaning (expect_boolean accepts only
  AND, src/statement_parse.c:633-638); we additionally *reject* OR with
  a clear error instead of silently stopping;
- time expressions: int | 'date' | timespan | now() | binary +-* chain,
  left-associative (src/statement_parse.c:821-877);
- INSERT VALUES tuple list; bare ``VALUE <float>`` stamps now() at
  parse time (src/statement_parse.c:983-996);
- CREATE options: retention timespan, duplication
  'ignore'|'insert'|'update'
  (src/statement_parse.c:879-922);
- SELECT clause order: FROM, then optional BETWEEN / WHERE / SAMPLE BY
  / LIMIT (src/statement_parse.c:1130-1154);
- ``earliest(value, n)`` accepted per the grammar doc
  (src/statement_parse.h:103) though the reference never lexes it.
"""

from __future__ import annotations

from raft_c_spark.frontend import ast
from raft_c_spark.frontend.ast import Fn, ParseError, QueryFlags
from raft_c_spark.frontend.lexer import T, Token, tokenize
from raft_c_spark.functions.timefn import now_ns


class _Parser:
    def __init__(self, tokens: list[Token], now: int | None = None):
        #: pinned now() for the PARSE-TIME stamps (VALUE / '*' forms,
        #: reference semantics src/statement_parse.c:990-991); falls
        #: back to wall clock when unpinned. Reviewer r8: these two
        #: forms previously ignored the engine's ``now`` pin, so
        #: "now pins now() for deterministic tests" was false for them
        self._now = now
        self.__init_tokens(tokens)

    def __init_tokens(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    # -- token plumbing ----------------------------------------------------

    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.type is not T.EOF:
            self.i += 1
        return t

    def expect(self, ttype: T) -> Token:
        t = self.next()
        if t.type is not ttype:
            raise ParseError(
                f"expected {ttype.name}, got {t.type.name} {t.value!r}", t.pos
            )
        return t

    def accept(self, ttype: T) -> Token | None:
        if self.peek().type is ttype:
            return self.next()
        return None

    # -- time-unit expressions --------------------------------------------

    def parse_timeunit(self) -> ast.TimeUnit:
        left = self._parse_tu_atom()
        while self.peek().type is T.BINOP:
            op = ast.BinOp(self.next().value)
            right = self._parse_tu_atom()
            left = ast.TuOps(left, op, right)
        return left

    def _parse_tu_atom(self) -> ast.TimeUnit:
        t = self.peek()
        if t.type is T.NUMBER:
            self.next()
            if "." in t.value or "e" in t.value.lower():
                raise ParseError(f"expected integer timestamp, got {t.value}", t.pos)
            return ast.TuValue(int(t.value))
        if t.type is T.LITERAL:
            self.next()
            return ast.TuDate(t.value)
        if t.type is T.TIMESPAN:
            self.next()
            num = "".join(ch for ch in t.value if ch.isdigit())
            unit = t.value[len(num) :]
            return ast.TuSpan(int(num), unit)
        if t.type is T.FUNC and t.value == "now":
            self.next()
            self.expect(T.LPAREN)
            self.expect(T.RPAREN)
            return ast.TuFunc(Fn.NOW)
        raise ParseError(f"expected time expression, got {t.value!r}", t.pos)

    def _parse_number(self) -> float | int:
        """NUMBER with optional unary minus — EXTENSION: the reference
        lexes '-' only as a binary operator (src/statement_parse.c:137)
        so negative literals are inexpressible there, which makes
        negative measurements unstorable through the language; accepted
        here. Integral literals stay Python int (reviewer r8): coercing
        every literal to float silently rounded epoch-ns WHERE bounds —
        doubles near 1.7e18 are spaced 256 apart — breaking the
        integer-exact timestamp comparisons the repo's own ns rule
        requires."""
        neg = False
        t = self.peek()
        if t.type is T.BINOP and t.value == "-":
            self.next()
            neg = True
        t = self.next()
        if t.type is not T.NUMBER:
            raise ParseError(f"expected number, got {t.value!r}", t.pos)
        text = t.value
        v = float(text) if ("." in text or "e" in text.lower()) else int(text)
        return -v if neg else v

    # -- statements --------------------------------------------------------

    def parse(self) -> ast.Statement:
        t = self.next()
        if t.type is T.CREATEDB:
            stmt: ast.Statement = ast.CreateDb(self.expect(T.IDENTIFIER).value)
            self._expect_end()
            return stmt
        if t.type is T.USE:
            stmt = ast.Use(self.expect(T.IDENTIFIER).value)
            self._expect_end()
            return stmt
        if t.type is T.CREATE:
            return self._parse_create()
        if t.type is T.DELETE:
            return self._parse_delete()
        if t.type is T.INSERT:
            return self._parse_insert()
        if t.type is T.SELECT:
            return self._parse_select()
        if t.type is T.META:
            stmt = ast.Meta(t.value)
            self._expect_end()
            return stmt
        raise ParseError(f"unknown statement start {t.value!r}", t.pos)

    def _parse_create(self) -> ast.Create:
        name = self.expect(T.IDENTIFIER).value
        retention = None
        duplication = None
        if self.peek().type in (T.TIMESPAN, T.NUMBER):
            retention = self.parse_timeunit()
        lit = self.accept(T.LITERAL)
        if lit:
            # 'update' is DP_UPDATE: described in the reference's
            # duplication-policy comment (src/timeseries.h:38-42) but
            # absent from its enum — implemented here (newest wins)
            if lit.value not in ("ignore", "insert", "update"):
                raise ParseError(
                    f"duplication policy must be 'ignore', 'insert' or "
                    f"'update', got {lit.value!r}",
                    lit.pos,
                )
            duplication = lit.value
        self._expect_end()
        return ast.Create(ts_name=name, retention=retention, duplication=duplication)

    def _parse_delete(self) -> ast.Delete:
        name = self.expect(T.IDENTIFIER).value
        if self.accept(T.FROM):
            db = self.expect(T.IDENTIFIER).value
            self._expect_end()
            return ast.Delete(name=name, db_name=db, single=False)
        self._expect_end()
        return ast.Delete(name=name, single=True)

    def _parse_insert(self) -> ast.Insert:
        self.expect(T.INTO)
        name = self.expect(T.IDENTIFIER).value
        records: list[ast.InsertRecord] = []
        if self.accept(T.VALUES):
            while True:
                self.expect(T.LPAREN)
                # '*' may lex as BINOP or (followed by ',') IDENTIFIER
                if self.peek().value == "*":
                    # TIMESTAMP ::= NUMBER | "*" (grammar doc,
                    # src/statement_parse.h:135): '*' = server-stamped
                    # now(), like the VALUE form
                    self.next()
                    tu: ast.TimeUnit = ast.TuValue(
                        self._now if self._now is not None else now_ns()
                    )
                else:
                    tu = self.parse_timeunit()
                self.expect(T.COMMA)
                val = self._parse_number()
                self.expect(T.RPAREN)
                records.append(ast.InsertRecord(tu, val))
                if not self.accept(T.COMMA):
                    break
        elif self.accept(T.VALUE):
            # auto-timestamp: the reference stamps current_nanos() at
            # *parse* time (src/statement_parse.c:990-991) — replicated.
            val = self._parse_number()
            records.append(
                ast.InsertRecord(
                    ast.TuValue(
                        self._now if self._now is not None else now_ns()
                    ),
                    val,
                )
            )
        else:
            t = self.peek()
            raise ParseError("expected VALUES or VALUE", t.pos)
        self._expect_end()
        return ast.Insert(ts_name=name, records=tuple(records))

    def _parse_select(self) -> ast.Select:
        flags = QueryFlags.BASE
        function = Fn.NONE
        fn_arg = None
        functions: list[Fn] = []
        t = self.peek()
        if t.type is T.FUNC:
            # one or more aggregate calls: the multi-aggregate form
            # `SELECT min(value), max(value), avg(value)` is grammar-doc
            # declared (src/statement_parse.h:97) but unsupported by the
            # reference parser — implemented here per SURVEY §2.5
            while True:
                ft = self.expect(T.FUNC)
                if ft.value == "now":
                    raise ParseError("now() is not a projection", ft.pos)
                fn = Fn(ft.value)
                functions.append(fn)
                flags |= QueryFlags.FUNC
                self.expect(T.LPAREN)
                # projected identifier parsed and discarded — single
                # value column (src/statement_parse.c:1034-1043)
                if self.peek().type in (T.IDENTIFIER, T.VALUE):
                    self.next()
                if fn is Fn.EARLIEST and self.accept(T.COMMA):
                    fn_arg = int(self._parse_number())
                self.expect(T.RPAREN)
                if not self.accept(T.COMMA):
                    break
            function = functions[0]
            if len(functions) > 1:
                if not set(functions) <= {Fn.MIN, Fn.MAX, Fn.AVG}:
                    raise ParseError(
                        "multi-aggregate select supports min/max/avg only",
                        t.pos,
                    )
                if len(set(functions)) != len(functions):
                    # duplicates would alias to the same output column
                    raise ParseError(
                        "duplicate aggregate in multi-aggregate select", t.pos
                    )
        elif t.type in (T.IDENTIFIER, T.VALUE):
            self.next()  # SELECT value — identifier discarded
        else:
            raise ParseError(f"expected projection, got {t.value!r}", t.pos)

        self.expect(T.FROM)
        ts_name = self.expect(T.IDENTIFIER).value

        selector: ast.Interval | None = None
        where: tuple[ast.WhereCond, ...] = ()
        sampling = None
        fill: str | float | None = None
        limit = None

        if self.accept(T.BETWEEN):
            start = self.parse_timeunit()
            self.expect(T.AND)
            end = self.parse_timeunit()
            selector = ast.Interval(start, end)
            flags |= QueryFlags.RNGE
        elif self.accept(T.AT):
            # exact-timestamp point lookup — the S_SINGLE selector the
            # reference declares in its AST (src/statement_parse.h:192-203)
            # but gives no grammar path; AT <time> is our documented
            # syntax for it (maps to ts_find, src/timeseries.c:729-780)
            selector = self.parse_timeunit()
            flags |= QueryFlags.RNGE
        if self.accept(T.WHERE):
            where = self._parse_where()
            flags |= QueryFlags.COND
        if self.accept(T.SAMPLE):
            self.expect(T.BY)
            sampling = self.parse_timeunit()
            flags |= QueryFlags.SMPL
            if self.accept(T.FILL):
                # grammar extension: FILL(prev | null | <number>) —
                # gap-filled sampling (operators/tsdb.sample_by_fill)
                self.expect(T.LPAREN)
                tok = self.next()
                if tok.type is T.IDENTIFIER and tok.value in ("prev", "null"):
                    fill = tok.value
                elif tok.type is T.NUMBER:
                    fill = float(tok.value)
                else:
                    raise ParseError(
                        f"FILL expects prev, null or a number, "
                        f"got {tok.value!r}",
                        tok.pos,
                    )
                self.expect(T.RPAREN)
        if self.accept(T.LIMIT):
            limit = int(self._parse_number())
            flags |= QueryFlags.LIMT
        self._expect_end()
        return ast.Select(
            ts_name=ts_name,
            selector=selector,
            where=where,
            function=function,
            fn_arg=fn_arg,
            functions=tuple(functions),
            sampling=sampling,
            fill=fill,
            limit=limit,
            flags=flags,
        )

    def _parse_where(self) -> tuple[ast.WhereCond, ...]:
        conds: list[ast.WhereCond] = []
        while True:
            key_tok = self.peek()
            if key_tok.type not in (T.IDENTIFIER, T.VALUE):
                # `value` lexes as a keyword; as a WHERE key it is an
                # identifier (reference skips keyword-matching after
                # WHERE, src/statement_parse.c:283-284)
                raise ParseError(f"expected WHERE key, got {key_tok.value!r}",
                                 key_tok.pos)
            key = self.next().value
            op_tok = self.expect(T.OPERATOR)
            val = self._parse_number()
            conds.append(ast.WhereCond(key=key, op=op_tok.value, value=val))
            if self.peek().type is T.OR:
                # the reference's enum has OR but its grammar never
                # parses it (src/statement_parse.h:161,
                # src/statement_parse.c:633-638) — explicit error
                raise ParseError("OR is not supported in WHERE chains",
                                 self.peek().pos)
            if not self.accept(T.AND):
                break
        return tuple(conds)

    def _expect_end(self) -> None:
        t = self.peek()
        if t.type is not T.EOF:
            raise ParseError(f"unexpected trailing input {t.value!r}", t.pos)


def parse(query: str, now: int | None = None) -> ast.Statement:
    """Parse one statement (stmt_parse, src/statement_parse.c:1156-1197).
    ``now`` pins the PARSE-TIME stamps of the VALUE / '*' insert forms
    (explicit now() expressions are pinned later by eval_timeunit)."""
    return _Parser(tokenize(query), now=now).parse()
