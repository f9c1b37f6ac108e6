"""Tokenizer for the query language.

Token surface mirrors the reference lexer (src/statement_parse.c:
match_separator/match_literal/match_timeunit/match_number/
match_keyword/match_identifier, :130-470):

- identifiers are any non-space, non-paren, non-comma run (dashes and
  dots legal: ``ts-test``), case-preserving;
- keywords are case-insensitive;
- numbers: int, float, exponent float (2.5e-3, src/statement_parse.c:
  204-231);
- timespans: ``<digits><unit>`` with unit in ns/us/ms/s/m/h/d
  (src/statement_parse.c:243-273);
- string literals in single quotes (dates, duplication policy);
- functions are identifiers immediately followed by ``(``
  (min/max/avg/now/latest + earliest, which the grammar doc declares,
  src/statement_parse.h:103).
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass

from raft_c_spark.frontend.ast import ParseError


class T(enum.Enum):
    USE = "USE"
    CREATEDB = "CREATEDB"
    CREATE = "CREATE"
    DELETE = "DELETE"
    INSERT = "INSERT"
    SELECT = "SELECT"
    FROM = "FROM"
    INTO = "INTO"
    WHERE = "WHERE"
    BETWEEN = "BETWEEN"
    AT = "AT"
    AND = "AND"
    OR = "OR"
    SAMPLE = "SAMPLE"
    BY = "BY"
    FILL = "FILL"
    LIMIT = "LIMIT"
    VALUE = "VALUE"
    VALUES = "VALUES"
    META = "META"
    FUNC = "FUNC"  # min/max/avg/now/latest/earliest
    IDENTIFIER = "IDENTIFIER"
    NUMBER = "NUMBER"  # int or float literal
    TIMESPAN = "TIMESPAN"  # e.g. 3ms
    LITERAL = "LITERAL"  # '...'
    OPERATOR = "OPERATOR"  # = != > >= < <=
    BINOP = "BINOP"  # + - *
    COMMA = ","
    LPAREN = "("
    RPAREN = ")"
    EOF = "EOF"


@dataclass(frozen=True)
class Token:
    type: T
    value: str
    pos: int


_KEYWORDS = {
    "use": T.USE,
    "createdb": T.CREATEDB,
    "create": T.CREATE,
    "delete": T.DELETE,
    "insert": T.INSERT,
    "select": T.SELECT,
    "from": T.FROM,
    "into": T.INTO,
    "where": T.WHERE,
    "between": T.BETWEEN,
    "at": T.AT,
    "and": T.AND,
    "or": T.OR,
    "sample": T.SAMPLE,
    "by": T.BY,
    "fill": T.FILL,
    "limit": T.LIMIT,
    "value": T.VALUE,
    "values": T.VALUES,
    ".databases": T.META,
    ".timeseries": T.META,
}

_FUNCTIONS = {"min", "max", "avg", "now", "latest", "earliest"}

_RE_TIMESPAN = re.compile(r"(\d+)(ns|us|ms|s|m|h|d)(?![\w.\-])")
_RE_NUMBER = re.compile(r"(\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)(?![\w.\-])")
_RE_OPERATOR = re.compile(r"(>=|<=|!=|=|>|<)")
_RE_IDENT = re.compile(r"[^\s(),]+")


def tokenize(query: str) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(query)
    while i < n:
        c = query[i]
        if c.isspace():
            i += 1
            continue
        if c == ",":
            tokens.append(Token(T.COMMA, ",", i))
            i += 1
            continue
        if c == "(":
            tokens.append(Token(T.LPAREN, "(", i))
            i += 1
            continue
        if c == ")":
            tokens.append(Token(T.RPAREN, ")", i))
            i += 1
            continue
        if c == "'":
            j = query.find("'", i + 1)
            if j < 0:
                raise ParseError("unterminated string literal", i)
            tokens.append(Token(T.LITERAL, query[i + 1 : j], i))
            i = j + 1
            continue
        m = _RE_OPERATOR.match(query, i)
        if m:
            tokens.append(Token(T.OPERATOR, m.group(1), i))
            i = m.end()
            continue
        if c in "+-*" and _is_standalone(query, i):
            tokens.append(Token(T.BINOP, c, i))
            i += 1
            continue
        m = _RE_TIMESPAN.match(query, i)
        if m:
            tokens.append(Token(T.TIMESPAN, m.group(0), i))
            i = m.end()
            continue
        m = _RE_NUMBER.match(query, i)
        if m:
            tokens.append(Token(T.NUMBER, m.group(0), i))
            i = m.end()
            continue
        m = _RE_IDENT.match(query, i)
        if m:
            word = m.group(0)
            low = word.lower()
            rest = query[m.end() :].lstrip()
            if low in _FUNCTIONS and rest.startswith("("):
                tokens.append(Token(T.FUNC, low, i))
            elif low in _KEYWORDS:
                tok_type = _KEYWORDS[low]
                tokens.append(
                    Token(tok_type, low.lstrip(".") if tok_type is T.META else word, i)
                )
            else:
                tokens.append(Token(T.IDENTIFIER, word, i))
            i = m.end()
            continue
        raise ParseError(f"unexpected character {c!r}", i)
    tokens.append(Token(T.EOF, "", n))
    return tokens


def _is_standalone(query: str, i: int) -> bool:
    """A +/-/* is a binary operator only when surrounded by whitespace
    or parens/start/end — otherwise it is part of an identifier like
    ``ts-test`` (reference: is_binaryop applies to a whole identifier
    run, src/statement_parse.c:373-376)."""
    before_ok = i == 0 or query[i - 1].isspace() or query[i - 1] in "()"
    after = query[i + 1 : i + 2]
    after_ok = after == "" or after.isspace() or after in "()" or after.isdigit()
    return before_ok and after_ok
