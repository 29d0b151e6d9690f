"""Parser round-trip tests (ported from reference parser/src/ast.rs:238-390
and parse.rs:95-111)."""

import pytest

from za_tpu.lang.parser import (
    ParseError, parse, parse_expression, parse_statement, preprocess,
)


def expr_eq(src, expected):
    assert parse_expression(src).format() == expected


def stmt_roundtrip(src):
    assert parse_statement(src).format() == src


def body_roundtrip(src):
    elements = parse(src)
    assert len(elements) == 1
    assert elements[0].format() == src


# -- expressions -------------------------------------------------------------


def test_expression_number():
    expr_eq("255", "255")
    expr_eq("-255", "(- 255)")
    expr_eq("0xFF", "255")
    expr_eq("0xff", "255")


def test_expression_intpri():
    expr_eq(
        "- 1 | 2 ^ 3 & 4 << 5 + 6 * 7",
        "((- 1) | (2 ^ (3 & (4 << (5 + (6 * 7))))))",
    )


def test_expression_intpri_inv():
    expr_eq(
        "(a | b) ^ c & d << e + f * g",
        "((a | b) ^ (c & (d << (e + (f * g)))))",
    )


def test_expression_boolpri():
    expr_eq(
        "a == b && c == d || e == f",
        "(((a == b) && (c == d)) || (e == f))",
    )


def test_expression_boolexp_pri():
    expr_eq(
        "a > b || c < d || e >=f || g<=h || i==j || k !=l",
        "((((((a > b) || (c < d)) || (e >= f)) || (g <= h)) || (i == j)) || (k != l))",
    )


def test_expression_boolexp_pri_inv():
    expr_eq(
        "(a == b && c == d) || e == f",
        "(((a == b) && (c == d)) || (e == f))",
    )


def test_expression_indexed_pinned_variable():
    expr_eq("a", "a")
    expr_eq("a[5]", "a[5]")
    expr_eq("a.b", "a.b")
    expr_eq("a[5].b", "a[5].b")
    expr_eq("a[c[1*1].d].b", "a[c[(1 * 1)].d].b")


def test_expression_function():
    expr_eq("f(a*1,b(),c(1*2))", "f((a * 1),b(),c((1 * 2)))")


def test_expression_pow():
    expr_eq("2 ** 3 ** 4", "((2 ** 3) ** 4)")
    expr_eq("-a ** b", "((- a) ** b)")


def test_expression_array_literal():
    expr_eq("[1,2,[3,4]]", "[1,2,[3,4]]")


# -- statements --------------------------------------------------------------


def test_statement_declaration():
    stmt_roundtrip("var a;")
    stmt_roundtrip("var a = b;")
    stmt_roundtrip("component a = b;")
    stmt_roundtrip("signal a;")
    stmt_roundtrip("signal input a;")
    stmt_roundtrip("signal private input a;")
    stmt_roundtrip("signal output a;")


def test_statement_assigment():
    stmt_roundtrip("a = b;")
    stmt_roundtrip("a -= b;")
    stmt_roundtrip("a *= b;")
    stmt_roundtrip("a /= b;")
    stmt_roundtrip("a %= b;")
    stmt_roundtrip("a >>= b;")
    stmt_roundtrip("a <<= b;")
    stmt_roundtrip("a |= b;")
    stmt_roundtrip("a &= b;")
    stmt_roundtrip("a[1].a = b;")


def test_statement_ifelse():
    stmt_roundtrip("if (a) {b = c;}")
    stmt_roundtrip("if (a) {b = c;} else {b = c;}")
    stmt_roundtrip("if (a) {b = c;} else if (b) {d = e;}")
    stmt_roundtrip("if (a) {b = c;} else if (b) {d = e;} else {i = k;}")


def test_statement_while():
    stmt_roundtrip("while (a) {b += c;}")


def test_statement_for():
    stmt_roundtrip("for (a = u;(a < b);a += d) {b += c;}")
    stmt_roundtrip("for (var a = u;(a < b);a += d) {b += c;}")


def test_statement_return():
    stmt_roundtrip("return a;")


def test_statement_signal():
    stmt_roundtrip("a <-- b;")
    stmt_roundtrip("a --> b;")
    stmt_roundtrip("a ==> b;")
    stmt_roundtrip("a <== b;")
    stmt_roundtrip("a === b;")


def test_statement_block():
    stmt_roundtrip("if (a) {b = c; b = c;}")
    stmt_roundtrip("if (a) {b = c; b = c;} else {a = a; b = a;}")


def test_statement_internal_call():
    stmt_roundtrip("dbg!(a,b);")


def test_statement_attrs():
    s = parse_statement("#[w] a <-- b;")
    assert s.meta.attrs == ("w",)
    assert s.meta.has_tag_w()


# -- body elements -----------------------------------------------------------


def test_body_element():
    body_roundtrip('include "hola";')
    body_roundtrip("function f1(a,b,c) {a += b;}")
    body_roundtrip("template f1(a,b,c) {a += b;}")
    body_roundtrip("var a;")


def test_template_attrs():
    elements = parse("#[test] template t() {a = 1;}")
    assert elements[0].meta.attrs == ("test",)
    assert elements[0].meta.has_tag_test()


def test_parse_error_meta():
    with pytest.raises(ParseError) as e:
        parse("template t( {}")
    assert e.value.meta.start > 0


# -- preprocessor (parse.rs:95-111) ------------------------------------------


def test_preprocessor_comments():
    assert preprocess("helo // jalo") == "helo        "
    assert preprocess("helo // jalo\nfoo") == "helo        \nfoo"
    assert preprocess("helo /* jalo */\nfoo") == "helo           \nfoo"
    assert preprocess("helo /* jalo \n*/foo") == "helo            foo"
    assert preprocess("helo /* // */foo") == "helo         foo"
    assert preprocess("a /*#[foo]#*/ b") == "a   #[foo]    b"


def test_preprocessor_unterminated():
    with pytest.raises(ParseError):
        preprocess("a /* b")
