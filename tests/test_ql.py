"""Query-syntax parser unit tests (grammar per SURVEY.md §2.2/§3.1)."""

from __future__ import annotations

from groonga_spark.ql import And, Not, Or, Phrase, Term, parse_query, query_terms


def test_single_term():
    assert parse_query("spark") == Term("spark")


def test_implicit_and():
    ast = parse_query("a b c")
    assert isinstance(ast, And)
    assert ast.children == [Term("a"), Term("b"), Term("c")]


def test_or():
    ast = parse_query("a OR b")
    assert isinstance(ast, Or)
    assert ast.children == [Term("a"), Term("b")]


def test_or_binds_looser_than_and():
    ast = parse_query("a b OR c d")
    assert isinstance(ast, Or)
    assert ast.children[0] == And([Term("a"), Term("b")])
    assert ast.children[1] == And([Term("c"), Term("d")])


def test_not():
    ast = parse_query("a -b")
    assert isinstance(ast, And)
    assert ast.children == [Term("a"), Not(Term("b"))]


def test_phrase():
    ast = parse_query('"hello world" x')
    assert isinstance(ast, And)
    assert ast.children[0] == Phrase("hello world")
    assert ast.children[1] == Term("x")


def test_parens():
    ast = parse_query("(a OR b) c")
    assert isinstance(ast, And)
    assert isinstance(ast.children[0], Or)
    assert ast.children[1] == Term("c")


def test_hyphenated_term_not_negation():
    ast = parse_query("foo-bar")
    assert ast == Term("foo-bar")


def test_empty_and_garbage():
    assert parse_query("") is None
    assert parse_query("   ") is None
    assert parse_query("()") is None


def test_unclosed_phrase():
    assert parse_query('"abc') == Phrase("abc")


def test_query_terms():
    ast = parse_query('a "b c" OR (-d e)')
    assert sorted(query_terms(ast)) == ["a", "b c", "d", "e"]


def test_cjk_term():
    assert parse_query("日本語") == Term("日本語")


def test_phrase_backslash_escapes():
    """Backslash-escaped quotes (and backslashes) inside phrases — the
    reference QL convention; must not terminate the phrase early."""
    from groonga_spark.ql import Phrase, parse_query

    p = parse_query('"say \\"hi\\""')
    assert isinstance(p, Phrase) and p.text == 'say "hi"'
    p2 = parse_query('"back\\\\slash"')
    assert p2.text == "back\\slash"
    p3 = parse_query('"unterminated')
    assert p3.text == "unterminated"


def test_escaped_literal_star_is_unescaped():
    """foo\\* is a literal-star TERM, not a prefix — and the backslash
    must be stripped so the term text matches what documents contain."""
    from groonga_spark.ql import Prefix, Term, parse_query

    ast = parse_query("foo\\*")
    assert isinstance(ast, Term) and ast.text == "foo*"
    assert isinstance(parse_query("foo*"), Prefix)


def test_rewrite_none_conjunct_empties_and():
    """A positive AND conjunct rewriting to None (matches nothing) must
    empty the conjunction, not silently loosen it; a Not child rewriting
    to None is just no subtraction."""
    from groonga_spark.ql import And, Not, Term, rewrite

    drop_missing = lambda leaf: None if leaf.text == "missing" else leaf
    assert rewrite(And([Term("missing"), Term("x")]), drop_missing) is None
    kept = rewrite(And([Term("x"), Not(Term("missing"))]), drop_missing)
    assert isinstance(kept, Term) and kept.text == "x"
