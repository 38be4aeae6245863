"""Answer parsing + scoring rules.

Ported from the reference benchmark driver
(reference: mantis/benchmark/eval.py:16-79): the parse order
("final answer:" > "the answer is" > "answer:"), option-letter
extraction, the multi-choice fallback matching, and the NLVR2
true/false special case all define reported accuracies — keep exact.
"""

from __future__ import annotations

import re
from typing import Dict, List


def parse_answer(raw_answer: str) -> str:
    low = raw_answer.lower()
    for marker in ("final answer:", "the answer is", "answer:"):
        if marker in low:
            return raw_answer[low.index(marker) + len(marker):].strip()
    return raw_answer


def get_option(final_answer: str):
    if re.match(r"Answer: [A-Z]", final_answer):
        return final_answer[8]
    for s in final_answer:
        if s.isalpha():
            return s.upper()
    return None


def get_prediction(question_type: str, raw_answer: str, ref_answer: str,
                   options: List[str], dataset_name: str) -> Dict:
    answer = parse_answer(raw_answer)
    ref_answer = ref_answer.strip("()\n ")
    if question_type == "multi-choice":
        if len(ref_answer) != 1:
            for c in ref_answer:
                if c.isalpha():
                    ref_answer = c
                    break
        assert len(ref_answer) == 1, (
            f"Ref answer is not a single character: {ref_answer}")

        selected = get_option(answer)
        if selected and (ord(selected) - ord("A") < len(options)):
            correct = selected == ref_answer.upper()
            parsed = selected
        else:
            ref_idx = ord(ref_answer.upper()) - ord("A")
            if ref_idx >= len(options):
                correct = False
            else:
                ref_raw = options[ref_idx]
                if dataset_name == "nlvr2":
                    low = raw_answer.lower()
                    correct = (
                        ("true" in low and "false" not in low
                         and "true" in ref_raw.lower())
                        or ("false" in low and "true" not in low
                            and "false" in ref_raw.lower()))
                elif ref_raw.startswith(ref_answer + "."):
                    correct = (raw_answer.strip()
                               == ref_raw[len(ref_answer) + 1:].strip())
                elif ref_raw.startswith(ref_answer + ":"):
                    correct = (raw_answer.strip()
                               == ref_raw[len(ref_answer) + 1:].strip())
                elif ref_raw.startswith("(" + ref_answer + ")"):
                    correct = (raw_answer.strip()
                               == ref_raw[len(ref_answer) + 2:].strip())
                else:
                    correct = raw_answer.strip() == ref_raw.strip()
            parsed = raw_answer
    elif question_type == "short-answer":
        correct = ref_answer.lower() == answer.lower()
        parsed = answer
    else:
        raise ValueError(f"Unknown question type {question_type}")

    return {"raw_answer": raw_answer, "parsed_answer": parsed,
            "correct": bool(correct)}


def format_options(question: str, options: List[str]) -> str:
    """Append '(A) ...' option lines (reference: eval.py:164-173)."""
    option_idx = "A"
    for option in options:
        if not any(x in option.upper() for x in
                   (f"{option_idx})", f"{option_idx}:", f"{option_idx}.")):
            question += f"\n ({option_idx}) {option}"
        else:
            question += f"\n {option}"
        option_idx = chr(ord(option_idx) + 1)
    return question
