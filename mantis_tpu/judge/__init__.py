"""LLM-judge utilities (reference: mantis/easy_openai/)."""

from mantis_tpu.judge.openai_utils import (
    DiskCache,
    openai_completions,
    prompt_uid,
    to_chatml,
)
