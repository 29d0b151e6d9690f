"""Evaluator conformance suite (ported from reference
compiler/src/evaluator/test.rs)."""

import pytest

from za_tpu.algebra import FS, Value
from za_tpu.compiler.evaluator import EvalError, Evaluator, Mode, Scope, sv_repr


def constrain_eq(ev, index, value):
    formatted = ev.constraints.get(index).format(
        lambda id: ev.signals.get_by_id(id).full_name
    )
    assert formatted == value


def signal_eq(ev, name, value):
    signal = ev.signals.get_by_name(name)
    if signal is not None:
        assert ev.signals.to_string(signal.id) == value
    else:
        assert value == "None"


def scope_eq(scope, name, value):
    v = scope.get(name)
    got = f"Some({sv_repr(v)})" if v is not None else "None"
    assert got == value


def eval_generic(mode, s, deferred=()):
    ev = Evaluator(mode)
    for name, v in deferred:
        ev.set_deferred_value(name, Value(FS(v)))
    scope = Scope(True, None, "root")
    ev.eval_inline(scope, s)
    return ev, scope


def eval_constraint(s):
    return eval_generic(Mode.GEN_CONSTRAINTS, s)


def eval_witness(s):
    ev, scope = eval_generic(Mode.GEN_WITNESS, s)
    assert len(ev.constraints) == 0
    return ev, scope


def eval_witness_with_defer(s, deferred):
    ev, scope = eval_generic(Mode.GEN_WITNESS, s, deferred)
    assert len(ev.constraints) == 0
    ev_constraint, _ = eval_generic(Mode.GEN_CONSTRAINTS, s)
    ev_constraint.constraints.satisfies_with_signals(ev.signals)
    return ev, scope


def test_bodyp_vars():
    _, scope = eval_constraint(
        """
        var i = 1;
        var j = 5;
        var k = j;"""
    )
    scope_eq(scope, "i", "Some(Algebra(1))")
    scope_eq(scope, "j", "Some(Algebra(5))")
    scope_eq(scope, "k", "Some(Algebra(5))")


def test_infix_vars():
    _, scope = eval_constraint(
        """
        var i = 1+2*3;
        var j = i-3;"""
    )
    scope_eq(scope, "i", "Some(Algebra(7))")
    scope_eq(scope, "j", "Some(Algebra(4))")

    _, scope = eval_constraint(
        """
        var iyes = 1==1;
        var ino = 1!=1;
        var byes = iyes==iyes;
        var bno = iyes!=iyes;"""
    )
    scope_eq(scope, "iyes", "Some(Bool(true))")
    scope_eq(scope, "ino", "Some(Bool(false))")
    scope_eq(scope, "byes", "Some(Bool(true))")
    scope_eq(scope, "bno", "Some(Bool(false))")

    _, scope = eval_constraint(
        """
        var yes1 = 1<2;
        var no1 = 1 >2;
        var yes2 = 1<=2;
        var no2 = 1>=2;"""
    )
    scope_eq(scope, "yes1", "Some(Bool(true))")
    scope_eq(scope, "no1", "Some(Bool(false))")
    scope_eq(scope, "yes2", "Some(Bool(true))")
    scope_eq(scope, "no2", "Some(Bool(false))")


def test_prefix_vars():
    _, scope = eval_constraint(
        """
        var i = -5;
        var j=-i;"""
    )
    scope_eq(scope, "j", "Some(Algebra(5))")


def test_function():
    _, scope = eval_constraint(
        """
        function f(a) {
            return a;
        }
        var k=f(1);"""
    )
    scope_eq(scope, "k", "Some(Algebra(1))")

    _, scope = eval_constraint(
        """
        function f(a,b) {
            return a+b; }
        var k=f(1,2);"""
    )
    scope_eq(scope, "k", "Some(Algebra(3))")


def test_assig_vars():
    _, scope = eval_constraint(
        """
        function f(a) {
            var t=5;
            t+=a;
            t-=2;
            t*=2;
            return t;
        }
        var k=f(2);"""
    )
    scope_eq(scope, "k", "Some(Algebra(10))")


def test_for():
    _, scope = eval_constraint(
        """
        function fact(N) {
            var f=1;
            for (var i=1;i<=N;i+=1) {
                f = f * i;
            } return f;
        }
        var out=fact(10);"""
    )
    scope_eq(scope, "out", "Some(Algebra(3628800))")


def test_for_inner_return():
    _, scope = eval_constraint(
        """
        function fact(N) {
            var f=1;
            for (var i=1;i<=N;i+=1) {
                return N; f = f * i;
            }
            return f;
        }
        var out=fact(10);"""
    )
    scope_eq(scope, "out", "Some(Algebra(10))")


def test_while():
    _, scope = eval_constraint(
        """
        function fact(N) {
            var f=1;
            var i=1;
            while (i<=N) {
                f = f * i;
                i+=1;
            }
            return f;
        }
        var out=fact(10);"""
    )
    scope_eq(scope, "out", "Some(Algebra(3628800))")


def test_while_inner_return():
    _, scope = eval_constraint(
        """
        function fact(N) {
            var f=1;
            var i=1;
            while (i<=N) {
                return N;
                f = f * i;
                i+=1;
            }
            return f;
        }
        var out=fact(10);"""
    )
    scope_eq(scope, "out", "Some(Algebra(10))")


def test_if():
    _, scope = eval_constraint(
        """
        function test(v) {
            if (v==1) {
                return 1;
            }
            return 2;
        }
        var out1=test(1);
        var out2=test(2);"""
    )
    scope_eq(scope, "out1", "Some(Algebra(1))")
    scope_eq(scope, "out2", "Some(Algebra(2))")


def test_if_else():
    _, scope = eval_constraint(
        """
        function test(v){
            if (v==1) {
                return 1;
            } else {
                return 2;
            }
        }
        var out1=test(1);
        var out2=test(2);"""
    )
    scope_eq(scope, "out1", "Some(Algebra(1))")
    scope_eq(scope, "out2", "Some(Algebra(2))")


def test_matrix_get():
    _, scope = eval_constraint(
        """
        function test(){
            var M = [[1,2,3],[4,5,6],[7,8,9]];
            return M[1][1];
        }
        var out=test();"""
    )
    scope_eq(scope, "out", "Some(Algebra(5))")


def test_matrix_set():
    _, scope = eval_constraint(
        """
        function test(){
            var M[5][5];
            M[3][1] = 5;
            M[1][2] = 7;
            return M[3][1] + M[1][2];
        }
        var out=test();"""
    )
    scope_eq(scope, "out", "Some(Algebra(12))")


def test_template_signal_base():
    ev, _ = eval_constraint(
        """
        template t() {
            signal a;
            signal input b;
            signal private input c;
            signal output d;
        }
        component main=t();"""
    )
    signal_eq(ev, "main.a", "main.a:Internal:None")
    signal_eq(ev, "main.b", "main.b:PublicInput:None")
    signal_eq(ev, "main.c", "main.c:PrivateInput:None")
    signal_eq(ev, "main.d", "main.d:Output:None")
    signal_eq(ev, "main.e", "None")


def test_template_first_constrain():
    ev, _ = eval_constraint(
        """
        template t() {
            signal input a;
            signal input b;
            signal private input c;
            c === 5 * a * b  + 5;
        }
        component main=t();"""
    )
    constrain_eq(ev, 0, "[-5main.a]*[1main.b]+[-5one+1main.c]")


def test_onlywitness():
    ev, _ = eval_constraint(
        """
        template t() {
            signal a;
            var i = 1;
            #[w] i=2;
            a === i;
        }
        component main=t();"""
    )
    constrain_eq(ev, 0, "[ ]*[ ]+[1main.a-1one]")


def test_signal_fs_assign():
    ev, _ = eval_constraint(
        """
        template t() {
            signal in;
            signal const;
            const <-- 2;
            2 === 1 + in * const ;
        }
        component main=t();"""
    )
    signal_eq(ev, "main.const", "main.const:Internal:Some(2)")
    constrain_eq(ev, 0, "[ ]*[ ]+[-2main.in+1one]")


def test_signal_equivalence_constrain():
    ev, _ = eval_constraint(
        """
        template t() {
            signal in;
            signal out;
            out <== in;
            out === 1;
        }
        component main=t();"""
    )
    constrain_eq(ev, 0, "[ ]*[ ]+[1main.out-1main.in]")
    constrain_eq(ev, 1, "[ ]*[ ]+[1main.out-1one]")


def test_signal_fs_constrain():
    ev, _ = eval_constraint(
        """
        template t() {
            signal in;
            signal const;
            const <== 2;
            2 === 1 + in * const ;
        }
        component main=t();"""
    )
    constrain_eq(ev, 0, "[ ]*[ ]+[1main.const-2one]")
    constrain_eq(ev, 1, "[ ]*[ ]+[-2main.in+1one]")


def test_signal_single_array_assig():
    ev, _ = eval_constraint(
        """
        template t() {
            signal in[2][2];
            for (var i=0;i<2;i+=1) {
                in[i][0] <-- i+2 ;
                in[i][1] <--i+3 ;
            }
        }
        component main=t();"""
    )
    signal_eq(ev, "main.in[0][0]", "main.in[0][0]:Internal:Some(2)")
    signal_eq(ev, "main.in[0][1]", "main.in[0][1]:Internal:Some(3)")
    signal_eq(ev, "main.in[1][0]", "main.in[1][0]:Internal:Some(3)")
    signal_eq(ev, "main.in[1][1]", "main.in[1][1]:Internal:Some(4)")


def test_signal_single_array_constrain():
    ev, _ = eval_constraint(
        """
        template t() {
            signal in[2][2];
            signal s;
            in[1][0] + in[0][1] === 0 ;
        }
        component main=t();"""
    )
    constrain_eq(ev, 0, "[ ]*[ ]+[1main.in[1][0]+1main.in[0][1]]")


def test_signal_single_array_assig_constrain():
    ev, _ = eval_constraint(
        """
        template t() {
            signal in[2];
            signal s;
            in[0] <== 1 ;
            in[0] === in[1];
        }
        component main=t();"""
    )
    constrain_eq(ev, 0, "[ ]*[ ]+[1main.in[0]-1one]")
    constrain_eq(ev, 1, "[ ]*[ ]+[-1main.in[1]+1one]")


def test_subcomponent():
    ev, _ = eval_constraint(
        """
        template t0() {
            signal t0in;
            t0in === 5;
        }
        template t1() {
            signal t1in;
            component T0 = t0();
            t1in <== T0.t0in;
        }
        component main=t1();"""
    )
    constrain_eq(ev, 0, "[ ]*[ ]+[1main.T0.t0in-5one]")


def test_component_array():
    ev, _ = eval_constraint(
        """
        template t0() {
            signal t0in;
            t0in === 5;
        }
        template t1() {
            signal t1in;
            component T0[1];
            for (var k=0;k<1;k +=1) {
                T0[k] = t0();
                t1in <== T0[k].t0in;
            }
        }
        component main=t1();"""
    )
    constrain_eq(ev, 0, "[ ]*[ ]+[1main.T0[0].t0in-5one]")


def test_variable_array_simple():
    _, scope = eval_constraint(
        """
        function f() {
            var k[1];
            k[0]=6;
            return k[0];
        }
        var out=f();"""
    )
    scope_eq(scope, "out", "Some(Algebra(6))")


def test_variable_array_fe_init():
    _, scope = eval_constraint(
        """
        var P=[1,2,3,4,5];
        var out=P[2];"""
    )
    scope_eq(scope, "out", "Some(Algebra(3))")


def test_witness_simple_check():
    eval_witness(
        """
        template t0() {
            signal t0in;
            t0in <-- 5;
            t0in === 5;
        }
        component main = t0();"""
    )


def test_witness_simple_fail_unknown_value():
    with pytest.raises(EvalError):
        eval_witness(
            """
            template t0() {
                signal t0in;
                t0in === 5;
            }
            component main = t0();"""
        )


def test_witness_simple_fail_bad_value():
    with pytest.raises(EvalError):
        eval_witness(
            """
            template t0() {
                signal t0in;
                t0in <-- 2;
                t0in === 5;
            }
            component main = t0();"""
        )


def test_witness_pass_simple_lazy_init():
    eval_witness(
        """
        template t1() {
            signal input a;
            a === 2;
        }
        template t0() {
            component c1 = t1();
            c1.a <-- 2;
        }
        component main = t0();"""
    )


def test_witness_fail_simple_lazy_init():
    with pytest.raises(EvalError):
        eval_witness(
            """
            template t1() {
                signal input a;
                a === 3;
            }
            template t0() {
                component c1 = t1();
                c1.a <-- 2;
            }
            component main = t0();"""
        )


def test_witness_pass_simple_lazy_array():
    eval_witness(
        """
        template t2() {
            signal input in[1];
            signal output out;
            out <== in[0] * 3;
        }
        template t1() {
            signal input in[1];
            signal output out;
            component c2 = t2();
            c2.in[0] <==  in[0];
            out <== c2.out * 7;
        }
        template t0() {
            component c1[1];
            c1[0] = t1();
            c1[0].in[0] <== 2;
            c1[0].out === 2*3*7;
        }
        component main = t0();"""
    )


def test_deferred_evaluation():
    eval_witness_with_defer(
        """
        template t() {
            signal input a;
            signal input b;
            a === 2 * b;
        }
        component main = t();""",
        [("main.a", 4), ("main.b", 2)],
    )


def test_p_1():
    eval_witness_with_defer(
        """
        template t() {
            signal input p;
            signal output out;
            out <== 1-p;
        }
        component main = t();""",
        [("main.p", 2)],
    )


def test_signal_ordering():
    ev, _ = eval_constraint(
        """
        template t() {
            signal input pub1;
            signal private input priv1;
            signal int1;
            signal output out;
            signal private input priv2;
            signal int2;
            signal input pub2;
            out <== pub1 + pub2 + int1 + int2 + priv1 + priv2;
        }
        component main = t();"""
    )
    expected = [
        "main.out", "main.pub1", "main.pub2", "main.priv1",
        "main.priv2", "main.int1", "main.int2",
    ]
    for n, s in enumerate(expected):
        assert ev.signals.get_by_name(s).id == 1 + n


# -- scope unit tests (scope.rs:219-308) -------------------------------------


def test_scope_basic():
    sc = Scope(True, None, "sc1")
    sc.insert("k1", True)
    assert sc.get("k1") is True
    sc.update("k1", False)
    assert sc.get("k1") is False


def test_scope_no_duplicated_key():
    sc = Scope(True, None, "sc1")
    sc.insert("k1", True)
    with pytest.raises(EvalError):
        sc.insert("k1", False)


def test_scope_shadowing_allowed():
    sc1 = Scope(True, None, "sc1")
    sc1.insert("k1", True)
    sc2 = Scope(False, sc1, "sc2")
    sc2.insert("k1", True)


def test_scope_find_deeper_var_in_same_start():
    sc1 = Scope(True, None, "sc1")
    sc1.insert("k1", True)
    sc2 = Scope(False, sc1, "sc2")
    sc2.insert("k2", True)
    assert sc2.contains_key("k1")


def test_scope_find_deeper_var_in_another_start():
    sc1 = Scope(True, None, "sc1")
    sc1.insert("k1", True)
    sc2 = Scope(True, sc1, "sc2")
    sc2.insert("k2", True)
    assert not sc2.contains_key("k1")
    assert sc2.root().contains_key("k1")


def test_scope_returns():
    sc1 = Scope(True, None, "sc1")
    sc2 = Scope(False, sc1, "sc2")
    assert not sc1.has_return()
    assert not sc2.has_return()
    sc2.set_return(True)
    assert sc1.has_return()
    assert sc2.has_return()
    ret = sc2.take_return()
    assert not sc1.has_return()
    assert not sc2.has_return()
    assert ret is True
