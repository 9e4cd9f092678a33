"""graft Python client DSL — the remote usage mode.

Mirrors the reference client DSL (angelini/df client.py:1-245) surface
for the graft HTTP JSON server (graft.server.GraftServer): same
classes, same method names, same wire encoding — a user of the
reference's client switches by changing the import. Differences:

  * stdlib-only (urllib instead of requests — zero dependencies);
  * `Df.from_parquet(path)` added (the server's beyond-reference read);
  * `count()` / `take(n)` work (the reference server panics on them);
  * the URI is a constructor/env parameter, not a module constant.

Usage:
    from client import *
    df = Df.from_csv('data/small.csv', Schema([('int', Type.INT),
                                               ('string', Type.STRING),
                                               ('bool', Type.BOOL)]))
    df.filter('bool', Predicate(Comparator.EQUAL, Value(True))) \
      .select([c('int')]) \
      .aggregate({'int': Aggregator.AVERAGE}) \
      .collect()
"""

import enum
import json
import os
import urllib.request
import urllib.error

URI = os.environ.get('GRAFT_URI', 'http://127.0.0.1:3000/call')


class Type(enum.Enum):
    BOOL = 1
    INT = 2
    FLOAT = 3
    STRING = 4

    def serialize(self):
        return {Type.BOOL: 'Bool', Type.INT: 'Int',
                Type.FLOAT: 'Float', Type.STRING: 'String'}[self]


class Schema:
    def __init__(self, columns):
        self.columns = columns

    def serialize(self):
        return {'columns': [{'name': name, 'type_': type_.serialize()}
                            for (name, type_) in self.columns]}


class Comparator(enum.Enum):
    EQUAL = 1
    GREATER_THAN = 2
    GREATER_THAN_OR_EQ = 3
    LESS_THAN = 4
    LESS_THAN_OR_EQ = 5

    def serialize(self):
        return {Comparator.EQUAL: 'Equal',
                Comparator.GREATER_THAN: 'GreaterThan',
                Comparator.GREATER_THAN_OR_EQ: 'GreaterThanOrEq',
                Comparator.LESS_THAN: 'LessThan',
                Comparator.LESS_THAN_OR_EQ: 'LessThanOrEq'}[self]


class Value:
    def __init__(self, val):
        self.val = val

    def serialize(self):
        tag = {bool: 'Bool', int: 'Int', float: 'Float', str: 'String'}
        # floats cross the wire in the reference's phantom wrapper
        val = ({'value': self.val, 'phantom': None}
               if isinstance(self.val, float) else self.val)
        return {tag[type(self.val)]: val}


class Predicate:
    def __init__(self, comparator, value):
        self.comparator = comparator
        self.value = value

    def serialize(self):
        return {'comparator': self.comparator.serialize(),
                'value': self.value.serialize()}


class Aggregator(enum.Enum):
    AVERAGE = 1
    COUNT = 2
    FIRST = 3
    SUM = 4
    MAX = 5
    MIN = 6

    def serialize(self):
        return {Aggregator.AVERAGE: 'Average', Aggregator.COUNT: 'Count',
                Aggregator.FIRST: 'First', Aggregator.SUM: 'Sum',
                Aggregator.MAX: 'Max', Aggregator.MIN: 'Min'}[self]


class ArithmeticOp(enum.Enum):
    ADD = 1
    SUB = 2
    MUL = 3
    DIV = 4

    def serialize(self):
        return {ArithmeticOp.ADD: 'Add', ArithmeticOp.SUB: 'Subtract',
                ArithmeticOp.MUL: 'Multiply', ArithmeticOp.DIV: 'Divide'}[self]


class ColumnExprKind(enum.Enum):
    CONSTANT = 1
    SOURCE = 2
    ALIAS = 3
    OPERATION = 4

    def serialize(self):
        return {ColumnExprKind.CONSTANT: 'Constant',
                ColumnExprKind.SOURCE: 'Source',
                ColumnExprKind.ALIAS: 'Alias',
                ColumnExprKind.OPERATION: 'Operation'}[self]


class ColumnExpr:
    def __init__(self, kind, *args):
        self.kind = kind
        self.args = args

    def __add__(self, other):
        return ColumnExpr(ColumnExprKind.OPERATION, ArithmeticOp.ADD, self, other)

    def __sub__(self, other):
        return ColumnExpr(ColumnExprKind.OPERATION, ArithmeticOp.SUB, self, other)

    def __mul__(self, other):
        return ColumnExpr(ColumnExprKind.OPERATION, ArithmeticOp.MUL, self, other)

    def __truediv__(self, other):
        return ColumnExpr(ColumnExprKind.OPERATION, ArithmeticOp.DIV, self, other)

    def alias(self, name):
        return ColumnExpr(ColumnExprKind.ALIAS, name, self)

    def serialize(self):
        def ser(arg):
            return arg if isinstance(arg, str) else arg.serialize()
        if len(self.args) == 1:
            return {self.kind.serialize(): ser(self.args[0])}
        return {self.kind.serialize(): [ser(arg) for arg in self.args]}


def c(expr):
    """Column shorthand: a name → Source, a Value → Constant."""
    if isinstance(expr, Value):
        return ColumnExpr(ColumnExprKind.CONSTANT, expr)
    return ColumnExpr(ColumnExprKind.SOURCE, expr)


class GraftError(ValueError):
    """A 4xx from the server (protocol or plan error), message included."""


class Df:
    def __init__(self, dataframe, values, uri=URI):
        self.dataframe = dataframe  # opaque lineage token, round-tripped
        self.values = values
        self.uri = uri

    @staticmethod
    def call(dataframe, function, uri=URI):
        body = json.dumps({'dataframe': dataframe,
                           'function': function}).encode()
        req = urllib.request.Request(
            uri, data=body, headers={'Content-Type': 'application/json'})
        try:
            with urllib.request.urlopen(req) as res:
                payload = json.loads(res.read())
        except urllib.error.HTTPError as e:
            raise GraftError(e.read().decode()) from None
        return Df(payload['dataframe'], payload['blocks'], uri)

    @staticmethod
    def from_csv(path, schema, uri=URI):
        return Df.call(None, {'Read': ['csv', path, schema.serialize()]}, uri)

    @staticmethod
    def from_parquet(path, uri=URI):
        # beyond-reference: the server infers the schema from the file
        return Df.call(None, {'Read': ['parquet', path,
                                       Schema([]).serialize()]}, uri)

    def _op(self, op):
        return Df.call(self.dataframe, {'Op': op}, self.uri)

    def select(self, column_exprs):
        return self._op({'Select': [e.serialize() for e in column_exprs]})

    def filter(self, column_name, predicate):
        return self._op({'Filter': [column_name, predicate.serialize()]})

    def order_by(self, column_names):
        return self._op({'OrderBy': column_names})

    def group_by(self, column_names):
        return self._op({'GroupBy': column_names})

    def aggregate(self, aggregators):
        return self._op({'Aggregation': {col: agg.serialize()
                                         for (col, agg) in aggregators.items()}})

    def join(self, right, left_col, right_col):
        return self._op({'Join': [right.dataframe, left_col, right_col]})

    # --- beyond-reference verbs (graft server-side operator library;
    # the reference protocol has no equivalent) ---

    def dedup_exact(self, id_col, text_col):
        """Keep one representative (lowest id) per distinct content."""
        return self._op({'DedupExact': [id_col, text_col]})

    def minhash_pairs(self, id_col, text_col, threshold):
        """MinHash-LSH near-dup pairs (id_a, id_b, jaccard >= threshold)."""
        return self._op({'MinhashPairs': [id_col, text_col, threshold]})

    def window_topk(self, partition_col, order_col, k):
        """Top-k rows per partition by order_col desc, + 'rank' column."""
        return self._op({'WindowTopK': [partition_col, order_col, k]})

    def snapshot_diff(self, new_snapshot, key_col, payload_col):
        """Batch CDC: (key, change, old_fp, new_fp) of self (old) vs
        new_snapshot (another Df), unchanged keys dropped."""
        return self._op(
            {'SnapshotDiff': [new_snapshot.dataframe, key_col, payload_col]})

    def connected_components(self, src_col, dst_col):
        """(id, cluster) min-label components of this frame's pair rows;
        composes with minhash_pairs for remote end-to-end dedup."""
        return self._op({'ConnectedComponents': [src_col, dst_col]})

    def rrf_fuse(self, other, id_col, rank_col, k0=60, top_k=20):
        """Reciprocal-rank fusion of this (id, rank) list with another
        Df's: (id, rrf_fx, n_lists), fixed-point exact."""
        return self._op(
            {'RrfFuse': [other.dataframe, id_col, rank_col, k0, top_k]})

    def semantic_decontam(self, eval_df, id_col, vec_col, tau):
        """Embedding decontamination: (train_id, eval_id, cosine) for
        every row of self whose max cosine against eval_df reaches
        tau. Vectors never leave the server."""
        return self._op(
            {'SemanticDecontam': [eval_df.dataframe, id_col, vec_col, tau]})

    def collect(self):
        return Df.call(self.dataframe, {'Action': 'Collect'}, self.uri).values

    def count(self):
        return Df.call(self.dataframe, {'Action': 'Count'}, self.uri).values

    def take(self, n):
        return Df.call(self.dataframe, {'Action': {'Take': n}}, self.uri).values

    def collect_page(self, offset, limit):
        """Bounded slice of the result (beyond-reference verb): rows
        [offset, offset+limit) of this frame. Compose with order_by for
        stable page frames; the only Collect mode a row-capped server
        accepts for large results."""
        return Df.call(
            self.dataframe,
            {'Action': {'CollectPage': {'offset': offset, 'limit': limit}}},
            self.uri).values
