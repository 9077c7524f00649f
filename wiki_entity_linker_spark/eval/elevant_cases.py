"""ELEVANT-compatible evaluation-case semantics, reconstructed from the
reference's committed artifacts.

The reference repo (ad-freiburg/wiki_entity_linker) evaluates linkers with the
external, public ELEVANT harness (``evaluate.py:53-117`` drives
``elevant.evaluation.evaluator.Evaluator``).  The package itself is not
vendored in the reference, so this module re-derives the *observable*
semantics from the reference's committed evaluation artifacts
(``evaluation-results/*/*.wiki-fair-v2.eval_cases.jsonl`` +
``.eval_results.json``) and is validated against all of them case-by-case in
``tests/test_elevant_eval.py``.

Semantics recovered (and verified 0-residual against 270 published
bucket totals across 9 linkers x 2 modes):

* A *case* is one ground-truth label or one unmatched prediction.
* Span matching is exact after normalizing both sides: surrounding
  quotation marks are stripped and a trailing possessive (``'s`` / ``'``)
  is dropped.
* A label is *optional* if flagged ``optional`` or ``desc`` in the
  benchmark, or if its entity is ``DATETIME``/``QUANTITY``.
* ``<NIL>``-entity labels are "unknown": mode ``IGNORED`` ignores them
  unless the linker predicted something at their span; mode ``REQUIRED``
  demands a NIL prediction.
* Parent/child label families (explicit ``parent``/``children`` ids)
  evaluate at the parent level: the family is TP when the parent span is
  linked correctly, or when every non-neutral child resolves correctly
  with at least one correct child.
* Counting: every eval type on a parent/plain case counts 1; child cases
  count only their FPs (the family's TP/FN is carried by the parent case).

This file is intentionally free of Spark imports: it is the scalar
reference kernel.  The distributed recast lives in
``wiki_entity_linker_spark/eval/elevant_spark.py``.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

PRONOUNS = {
    "i", "me", "my", "mine", "myself",
    "we", "us", "our", "ours", "ourselves",
    "he", "him", "his", "himself",
    "she", "her", "hers", "herself",
    "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves",
}

QUOTES_END = '"”’'
QUOTES_START = '"“‘'

MODES = ("IGNORED", "REQUIRED")


def normalize_span(text: str, begin: int, end: int) -> tuple[int, int]:
    """Match ELEVANT's span-deviation tolerance: strip surrounding quotes
    and a trailing possessive suffix before comparing spans."""
    while end > begin and text[end - 1] in QUOTES_END:
        end -= 1
    while begin < end and text[begin] in QUOTES_START:
        begin += 1
    if end - 2 >= begin and text[end - 2:end] == "'s":
        end -= 2
    elif end - 1 > begin and text[end - 1] == "'":
        end -= 1
    return begin, end


def entity_kind(entity_id: Optional[str]) -> str:
    """'ent' (real KB entity), 'nil' (unknown), or 'datq' (datetime/quantity).

    ``''`` deliberately maps to 'ent': the reference's oracle artifacts show
    empty-id labels matching empty-id predictions as TP (string equality),
    while ``<NIL>``/``<NO_MAPPING>``/``Unknown*`` are the NIL spellings the
    harness treats as unknown entities."""
    if entity_id in ("DATETIME", "QUANTITY"):
        return "datq"
    if entity_id is None or entity_id in ("<NIL>", "<NO_MAPPING>") \
            or entity_id.startswith("Unknown"):
        return "nil"
    return "ent"


@dataclass
class Label:
    label_id: int
    span: tuple[int, int]
    entity_id: str
    name: str
    # True/False when the benchmark annotates coreference (wiki-fair-v2);
    # None when it does not (wiki-fair v1) — then coref-ness is derived
    # from the mention text, matching the reference harness
    coref: Optional[bool] = False
    optional: bool = False
    desc: bool = False
    parent: Optional[int] = None
    children: tuple[int, ...] = ()

    @property
    def kind(self) -> str:
        return entity_kind(self.entity_id)

    @property
    def is_optional(self) -> bool:
        return self.optional or self.desc or self.kind == "datq"


@dataclass
class Prediction:
    span: tuple[int, int]
    entity_id: Optional[str]
    name: str = ""


@dataclass
class Case:
    span: tuple[int, int]
    label: Optional[Label]
    prediction: Optional[Prediction]
    eval_types: dict = field(default_factory=dict)  # mode -> tuple of 'TP'/'FP'/'FN'
    mention_type: str = ""
    optional: bool = False
    is_child: bool = False


def _pred_status(label: Label, pred: Optional[Prediction]) -> str:
    """'none' | 'prednil' | 'correct' | 'wrong' for a prediction at the
    label's (normalized) span.  Exact id equality wins before the NIL check
    so that literal NIL-spelling matches count as correct."""
    if pred is None:
        return "none"
    if pred.entity_id == label.entity_id:
        return "correct"
    if entity_kind(pred.entity_id) != "ent":
        return "prednil"
    return "wrong"


def _node_vote(label: Label, status: str, mode: str) -> str:
    """Resolve one family member to 'ok' | 'fail' | 'neutral' for the
    family-level TP decision."""
    if status == "correct":
        return "ok"
    if label.is_optional:
        # optional members never block; a wrong prediction is charged as FP
        # separately but does not fail the family
        return "fail" if status == "wrong" else "neutral"
    if label.kind == "nil":
        if status == "prednil":
            # a NIL prediction is invisible in IGNORED mode, the right
            # answer in REQUIRED mode
            return "neutral" if mode == "IGNORED" else "ok"
        if status == "none":
            return "neutral" if mode == "IGNORED" else "fail"
        return "fail"  # wrong
    # plain entity
    if status == "none" or status == "prednil":
        return "fail"
    return "fail"  # wrong


def _name_is_named(name: Optional[str]) -> bool:
    """An entity is 'named' when the first alphabetic character of its KB
    name is uppercase ('1936 Summer Olympics' yes, '4th Virginia Regiment'
    no); names with no letters default to named."""
    if not name:
        return True
    for ch in name:
        if ch.isalpha():
            return ch.isupper()
    return False


def _mention_type(label: Label, article_text: str) -> str:
    mention = article_text[label.span[0]:label.span[1]]
    coref = label.coref
    if coref is None:
        # benchmark without coref annotations: classify from the text
        toks = mention.split()
        coref = mention.lower() in PRONOUNS or (
            len(toks) > 1 and toks[0].lower() in NOMINAL_STARTERS
            and not toks[1][:1].isupper())
    if coref:
        return "COREF_PRONOMINAL" if mention.lower() in PRONOUNS else "COREF_NOMINAL"
    kind = label.kind
    if kind == "nil":
        return "ENTITY_UNKNOWN"
    if kind == "datq":
        return "ENTITY_NAMED"
    return "ENTITY_NAMED" if _name_is_named(label.name) else "ENTITY_NON_NAMED"


NOMINAL_STARTERS = {
    "the", "this", "that", "these", "those",
    "my", "your", "his", "her", "its", "our", "their",
}


def _pred_mention_type(pred: Prediction, article_text: str) -> str:
    mention = article_text[pred.span[0]:pred.span[1]]
    if mention.lower() in PRONOUNS:
        return "COREF_PRONOMINAL"
    toks = mention.split()
    if len(toks) > 1 and toks[0].lower() in NOMINAL_STARTERS \
            and not toks[1][:1].isupper():
        return "COREF_NOMINAL"
    if entity_kind(pred.entity_id) != "ent":
        return "ENTITY_UNKNOWN"
    name = pred.name or ""
    named = _name_is_named(name) if name else True
    return "ENTITY_NAMED" if named else "ENTITY_NON_NAMED"


def _plain_eval_types(label: Label, status: str, mode: str) -> tuple[str, ...]:
    """Eval types for a label with no family (also used for the parent-level
    direct decision fallback)."""
    optional = label.is_optional
    kind = label.kind
    if optional:
        if status == "wrong":
            return ("FP",)
        if status == "prednil":
            # NIL prediction on an optional label: only REQUIRED charges it
            return ("FP",) if mode == "REQUIRED" else ()
        if status == "correct" and kind == "nil":
            return ()  # cannot happen: nil labels have no correct entity
        return ()  # none or correct: optional labels are free
    if kind == "nil":
        if mode == "IGNORED":
            # unknown labels are ignored: even a NIL prediction is silent
            if status == "wrong":
                return ("FP",)
            return ()
        # REQUIRED: any NIL-spelling prediction (including a literal match)
        # is the correct answer for an unknown label
        if status in ("prednil", "correct"):
            return ("TP",)
        if status == "wrong":
            return ("FN", "FP")
        return ("FN",)  # none
    # real entity label
    if status == "correct":
        return ("TP",)
    if status == "wrong":
        return ("FN", "FP")
    if status == "prednil":
        return ("FN",) if mode == "IGNORED" else ("FN", "FP")
    return ("FN",)  # none


def evaluate_article(
    text: str,
    labels: list[Label],
    predictions: list[Prediction],
    evaluation_span: Optional[tuple[int, int]] = None,
) -> list[Case]:
    """Generate evaluation cases for one article.

    Returns one Case per ground-truth label plus one per unmatched
    prediction, mirroring the reference's ``*.eval_cases.jsonl`` rows
    (``evaluate.py:117`` -> ``evaluator.evaluate_article``).
    """
    label_by_id = {l.label_id: l for l in labels}
    # two matching tiers: exact normalized spans always win; a prediction
    # that cuts a word mid-token ("adm|iral") additionally matches at the
    # token boundary, consulted only when no exact prediction exists there
    pred_by_span: dict[tuple[int, int], Prediction] = {}
    pred_by_ext: dict[tuple[int, int], tuple[tuple[int, int], Prediction]] = {}
    def _tok_char(i: int) -> bool:
        return 0 <= i < len(text) and text[i].isalnum()

    for p in predictions:
        ns = normalize_span(text, *p.span)
        pred_by_span[ns] = p
        b, e = ns
        # a prediction cutting an alphanumeric token expands to the token
        # boundary on either side ("adm|iral", "Aviamot|ornaya"); the
        # expanded span goes into the fallback tier only
        right = e
        if _tok_char(e) and e > b and _tok_char(e - 1):
            while _tok_char(right):
                right += 1
        left = b
        if _tok_char(b - 1) and b < e and _tok_char(b):
            while _tok_char(left - 1):
                left -= 1
        for span in {(b, right), (left, e), (left, right)} - {(b, e)}:
            pred_by_ext.setdefault(normalize_span(text, *span), (ns, p))

    def match_span(label: Label) -> Optional[tuple[int, int]]:
        ns = normalize_span(text, *label.span)
        if ns in pred_by_span:
            return ns
        ext = pred_by_ext.get(ns)
        if ext is not None:
            return ext[0]  # the prediction's own span (marks it consumed)
        return None

    def pred_for(label: Label) -> Optional[Prediction]:
        ms = match_span(label)
        return pred_by_span.get(ms) if ms is not None else None

    def inside(span: tuple[int, int]) -> bool:
        if not evaluation_span:
            return True
        return evaluation_span[0] <= span[0] and span[1] <= evaluation_span[1]

    cases: list[Case] = []
    matched_spans = set()

    # Subtree resolution, arbitrary nesting depth.  A node resolves
    # 'ok' | 'fail' | 'neutral' per mode: 'ok' when its span is linked
    # correctly or all its non-neutral children resolve ok (>=1 ok),
    # 'neutral' when the node is invisible in this mode (optional / unknown
    # without a prediction), 'fail' otherwise.
    def subtree_vote(label: Label, mode: str) -> str:
        status = _pred_status(label, pred_for(label))
        if status == "correct" and label.kind == "nil":
            status = "prednil"  # a literal NIL match is still a NIL answer
        if status == "correct":
            return "ok"
        if status == "prednil" and label.kind == "nil":
            # a NIL answer directly on an unknown node settles its subtree
            return "neutral" if mode == "IGNORED" else "ok"
        if label.kind == "nil" and status == "none" and mode == "IGNORED":
            # an unpredicted unknown node hides its whole subtree in
            # IGNORED mode (invisibility cascades)
            return "neutral"
        if label.children:
            votes = [subtree_vote(label_by_id[k], mode)
                     for k in label.children if k in label_by_id]
            if votes and "fail" not in votes and "ok" in votes:
                return "ok"
            if votes and all(v == "neutral" for v in votes):
                return _node_vote(label, status, mode)
            return "fail"
        return _node_vote(label, status, mode)

    def subtree_stats(label: Label) -> tuple[bool, bool]:
        """(any prediction in subtree, any required ent-kind member)."""
        visible = _pred_status(label, pred_for(label)) != "none"
        has_ent = label.kind == "ent" and not label.is_optional
        for k in label.children:
            if k in label_by_id:
                v, h = subtree_stats(label_by_id[k])
                visible = visible or v
                has_ent = has_ent or h
        return visible, has_ent

    for label in labels:
        span = match_span(label)
        pred = pred_by_span.get(span) if span is not None else None
        if pred is not None:
            matched_spans.add(span)
        status = _pred_status(label, pred)
        case = Case(
            span=label.span,
            label=label,
            prediction=pred,
            mention_type=_mention_type(label, text),
            optional=label.is_optional,
            is_child=label.parent is not None,
        )
        if not inside(label.span):
            continue  # the reference emits no case outside the span
        top = label.parent is None
        for mode in MODES:
            if top and label.children:
                kid_votes = [subtree_vote(label_by_id[k], mode)
                             for k in label.children if k in label_by_id]
                kids_ok = kid_votes and "fail" not in kid_votes \
                    and "ok" in kid_votes
                nil_status = "prednil" if (
                    status == "correct" and label.kind == "nil") else status
                if kids_ok:
                    case.eval_types[mode] = ("TP",)
                elif nil_status == "correct":
                    # a desc parent only counts through its children: its own
                    # direct match is an alternative wording, not a TP
                    case.eval_types[mode] = () if label.desc else ("TP",)
                elif nil_status == "wrong":
                    if label.is_optional:
                        case.eval_types[mode] = ("FP",)
                    elif label.kind == "nil":
                        case.eval_types[mode] = (
                            ("FP",) if mode == "IGNORED" else ("FN", "FP"))
                    else:
                        case.eval_types[mode] = ("FN", "FP")
                elif nil_status == "prednil":
                    if label.kind == "nil":
                        # a NIL answer satisfies an unknown parent
                        case.eval_types[mode] = (
                            () if mode == "IGNORED" else ("TP",))
                    elif label.is_optional:
                        # a NIL answer on an optional parent: REQUIRED still
                        # charges the stray prediction
                        case.eval_types[mode] = (
                            () if mode == "IGNORED" else ("FP",))
                    else:
                        case.eval_types[mode] = (
                            ("FN",) if mode == "IGNORED" else ("FN", "FP"))
                elif "fail" in kid_votes:
                    if label.kind == "nil" and mode == "IGNORED":
                        # unknown-rooted family: invisible unless some child
                        # subtree carries a prediction AND a real entity was
                        # actually missed
                        kid_stats = [subtree_stats(label_by_id[k])
                                     for k in label.children
                                     if k in label_by_id]
                        visible = any(v for v, _ in kid_stats)
                        has_ent = any(h for _, h in kid_stats)
                        case.eval_types[mode] = (
                            ("FN",) if visible and has_ent else ())
                    else:
                        case.eval_types[mode] = ("FN",)
                else:  # neutral family: parent's own (optional-aware) verdict
                    case.eval_types[mode] = _plain_eval_types(label, status, mode)
                if case.eval_types[mode] == ("FN",) and mode == "IGNORED":
                    kid_info = [(subtree_vote(label_by_id[k], mode),
                                 label_by_id[k].kind)
                                for k in label.children if k in label_by_id]
                    fails = [kind for v, kind in kid_info if v == "fail"]
                    if fails and all(kind == "nil" for kind in fails) and any(
                            v == "ok" and kind == "ent" for v, kind in kid_info):
                        # the only misses are unknown members (their FPs are
                        # charged at the children); the parent stays silent
                        case.eval_types[mode] = ()
            elif not top:
                parent = label_by_id.get(label.parent)
                ancestor = parent
                while ancestor is not None and ancestor.parent is not None:
                    ancestor = label_by_id.get(ancestor.parent)
                avote = subtree_vote(ancestor, mode) if ancestor else "fail"
                if avote == "ok":
                    case.eval_types[mode] = ("TP",) if status == "correct" else ()
                else:
                    # failed family: leaves carry individual eval types when
                    # the immediate parent is unpredicted and at least one
                    # sibling (or self) is predicted
                    parent_pred = pred_for(parent) is not None if parent else False
                    siblings = [label_by_id[k]
                                for k in (parent.children if parent else ())
                                if k in label_by_id]
                    any_sib_pred = any(pred_for(s) is not None for s in siblings)
                    def _any_correct(node: Label) -> bool:
                        if _pred_status(node, pred_for(node)) == "correct":
                            return True
                        return any(_any_correct(label_by_id[k])
                                   for k in node.children if k in label_by_id)

                    if label.children and status == "wrong" and ancestor \
                            and _any_correct(ancestor):
                        # a middle node's wrong prediction is silenced when
                        # the family found its match elsewhere
                        case.eval_types[mode] = ()
                    elif not parent_pred and any_sib_pred:
                        case.eval_types[mode] = _plain_eval_types(label, status, mode)
                    else:
                        case.eval_types[mode] = ()
            else:
                case.eval_types[mode] = _plain_eval_types(label, status, mode)
        cases.append(case)

    # Unmatched predictions -> FP cases
    for span, pred in pred_by_span.items():
        if span in matched_spans:
            continue
        case = Case(
            span=pred.span,
            label=None,
            prediction=pred,
            mention_type=_pred_mention_type(pred, text),
            optional=False,
            is_child=False,
        )
        if not inside(pred.span):
            continue  # the reference emits no case outside the span
        nil_pred = entity_kind(pred.entity_id) != "ent"
        case.eval_types = {
            "IGNORED": () if nil_pred else ("FP",),
            "REQUIRED": ("FP",),
        }
        cases.append(case)
    return cases


MENTION_BUCKETS = {
    "all": ("ENTITY_NAMED", "ENTITY_NON_NAMED", "ENTITY_UNKNOWN",
            "COREF_NOMINAL", "COREF_PRONOMINAL"),
    "entity": ("ENTITY_NAMED", "ENTITY_NON_NAMED", "ENTITY_UNKNOWN"),
    "coref": ("COREF_NOMINAL", "COREF_PRONOMINAL"),
    "entity_named": ("ENTITY_NAMED",),
    "entity_non_named": ("ENTITY_NON_NAMED",),
    "entity_unknown": ("ENTITY_UNKNOWN",),
    "coref_nominal": ("COREF_NOMINAL",),
    "coref_pronominal": ("COREF_PRONOMINAL",),
}


def aggregate(cases_per_article: list[list[Case]], mode: str = "IGNORED") -> dict:
    """Reduce cases to the reference's ``mention_types`` results table.

    Counting rule (validated 0-residual against all committed results):
    parent/plain cases contribute every eval type once; child cases
    contribute only FPs.
    """
    counts: dict[str, dict[str, int]] = {
        mt: {"TP": 0, "FP": 0, "FN": 0}
        for mts in MENTION_BUCKETS.values() for mt in mts
    }
    for cases in cases_per_article:
        for c in cases:
            for t in c.eval_types.get(mode, ()):
                if c.is_child and t != "FP":
                    continue
                counts[c.mention_type][t] += 1
    out = {}
    for bucket, mts in MENTION_BUCKETS.items():
        tp = sum(counts[m]["TP"] for m in mts)
        fp = sum(counts[m]["FP"] for m in mts)
        fn = sum(counts[m]["FN"] for m in mts)
        gt = tp + fn
        prec = tp / (tp + fp) if tp + fp else 0
        rec = tp / gt if gt else 0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0
        out[bucket] = {
            "true_positives": tp, "false_positives": fp,
            "false_negatives": fn, "ground_truth": gt,
            "precision": prec, "recall": rec, "f1": f1,
        }
    return out


def labels_from_benchmark_json(raw_labels: list[dict]) -> list[Label]:
    return [
        Label(
            label_id=l["id"],
            span=tuple(l["span"]),
            entity_id=l.get("entity_id") or "",
            name=l.get("name") or "",
            coref=(None if "coref" not in l else bool(l.get("coref"))),
            optional=bool(l.get("optional")),
            desc=bool(l.get("desc")),
            parent=l.get("parent"),
            children=tuple(l.get("children") or ()),
        )
        for l in raw_labels
    ]


def predictions_from_linked_json(raw_mentions: list[dict]) -> list[Prediction]:
    return [
        Prediction(span=tuple(m["span"]), entity_id=m.get("id"),
                   name=m.get("name") or "")
        for m in raw_mentions
    ]
