"""``equation`` — free-form arithmetic over series columns, compiled to
Spark Column expressions.

Reference semantics: /root/reference/tstoolbox/functions/equation.py
:206-294 — expressions over ``x1..xN`` (1-based column refs), the row
ordinal ``t``, and row-shifted refs ``x1[t-1]`` / ``x2[t+2]``
(out-of-range shifts → NaN); numpy elementwise functions.

Design: the reference ``eval``s the expression per row (equation.py:
261-266) — an arbitrary-code-execution surface and a per-row Python
loop. This implementation instead parses the expression with
``ast`` into a whitelisted node set and emits a Catalyst Column tree:
same math, no eval, whole-stage codegen, shifts become window
lag/lead. Unsupported constructs raise ValueError naming the node.
"""

from __future__ import annotations

import ast
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_FUNCS = {
    "abs": F.abs,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "arcsin": F.asin,
    "arccos": F.acos,
    "arctan": F.atan,
    "sinh": F.sinh,
    "cosh": F.cosh,
    "tanh": F.tanh,
    "exp": F.exp,
    "log": F.log,
    "log10": F.log10,
    "log2": F.log2,
    "sqrt": F.sqrt,
    "floor": F.floor,
    "ceil": F.ceil,
    "sign": F.signum,
    "round": F.round,
    "minimum": F.least,
    "maximum": F.greatest,
}

_BINOPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.Pow: lambda a, b: a**b,
    ast.Mod: lambda a, b: a % b,
}

_CMPOPS = {
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
}


class _Compiler(ast.NodeVisitor):
    def __init__(self, value_cols: Sequence[str], w: Window):
        self.cols = list(value_cols)
        self.w = w

    def compile(self, expr: str) -> Column:
        tree = ast.parse(expr.strip(), mode="eval")
        return self.visit(tree.body)

    def _colref(self, name: str) -> Column:
        if not (name.startswith("x") and name[1:].isdigit()):
            raise ValueError(f"unknown name {name!r} (use x1..xN or t)")
        i = int(name[1:])
        if not 1 <= i <= len(self.cols):
            raise ValueError(f"{name} out of range; have {len(self.cols)} columns")
        return F.col(self.cols[i - 1]).cast("double")

    def visit_Name(self, node):
        if node.id == "t":
            # row ordinal, 0-based like the reference's integer index
            return (F.row_number().over(self.w) - 1).cast("double")
        return self._colref(node.id)

    def visit_Constant(self, node):
        if isinstance(node.value, (int, float)):
            return F.lit(float(node.value))
        raise ValueError(f"unsupported literal {node.value!r}")

    def visit_BinOp(self, node):
        op = _BINOPS.get(type(node.op))
        if op is None:
            raise ValueError(f"unsupported operator {type(node.op).__name__}")
        return op(self.visit(node.left), self.visit(node.right))

    def visit_UnaryOp(self, node):
        v = self.visit(node.operand)
        if isinstance(node.op, ast.USub):
            return -v
        if isinstance(node.op, ast.UAdd):
            return v
        raise ValueError(f"unsupported unary {type(node.op).__name__}")

    def visit_Compare(self, node):
        if len(node.ops) != 1:
            raise ValueError("chained comparisons unsupported")
        op = _CMPOPS.get(type(node.ops[0]))
        if op is None:
            raise ValueError(f"unsupported comparison {type(node.ops[0]).__name__}")
        return op(self.visit(node.left), self.visit(node.comparators[0])).cast("double")

    def visit_Call(self, node):
        if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
            raise ValueError(f"unsupported function {ast.dump(node.func)}")
        return _FUNCS[node.func.id](*[self.visit(a) for a in node.args])

    def visit_Subscript(self, node):
        # x1[t-1] / x2[t+2] → lag/lead over the series window
        if not isinstance(node.value, ast.Name):
            raise ValueError("only column refs can be subscripted")
        col = self._colref(node.value.id)
        idx = node.slice
        if isinstance(idx, ast.Name) and idx.id == "t":
            return col
        if (
            isinstance(idx, ast.BinOp)
            and isinstance(idx.left, ast.Name)
            and idx.left.id == "t"
            and isinstance(idx.right, ast.Constant)
        ):
            k = int(idx.right.value)
            if isinstance(idx.op, ast.Sub):
                return F.lag(col, k).over(self.w)
            if isinstance(idx.op, ast.Add):
                return F.lead(col, k).over(self.w)
        raise ValueError("subscripts must be t, t-k, or t+k")

    def generic_visit(self, node):
        raise ValueError(f"unsupported syntax {type(node).__name__}")


def equation(
    df: DataFrame,
    expr: str,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    out_col: str = "equation",
) -> DataFrame:
    """Evaluate ``expr`` (over x1..xN, t, x_i[t±k]) as a new column."""
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    compiled = _Compiler(value_cols, w).compile(expr)
    return df.withColumn(out_col, compiled)
