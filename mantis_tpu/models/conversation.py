"""Conversation templating for Mantis-style chat rendering.

Behavioral re-implementation of the reference's prompt templating layer
(reference: mantis/models/conversation.py:6-645).  Each ``SeparatorStyle``
renders role-tagged messages into the exact prompt string the corresponding
tokenizer/model family was trained on; the rendering rules below match the
reference's ``Conversation.get_prompt`` byte-for-byte so that token streams
(and hence label masks, see mantis_tpu/train/data.py) line up.

This module is pure Python/host-side; nothing here is traced by JAX.
"""

from __future__ import annotations

import dataclasses
from enum import Enum, auto
from typing import Dict, List, Optional, Sequence, Tuple


class SeparatorStyle(Enum):
    """Prompt separator styles (reference: conversation.py:6-17)."""

    SINGLE = auto()
    TWO = auto()
    MPT = auto()
    PLAIN = auto()
    LLAMA_2 = auto()
    LLAMA_3 = auto()
    IDEFICS_2 = auto()
    IDEFICS_3 = auto()
    MFUYU = auto()
    QWEN2VL = auto()


def _msg_text(message) -> str:
    """Messages may be (text, image, mode) tuples from UI layers."""
    if isinstance(message, tuple):
        return message[0]
    return message


@dataclasses.dataclass
class Conversation:
    """Keeps conversation history and renders it to a prompt string.

    Field semantics follow the reference (conversation.py:20-43):
      system          full system preamble (may embed special tokens)
      roles           (user_role, assistant_role) strings
      messages        list of [role, message] pairs
      offset          number of few-shot messages to skip in UI views
      sep / sep2      separator strings (usage depends on sep_style)
      sep_offset      extra token offset for label masking (internlm2 styles)
      stop_str        extra stop string for generation
    """

    system: str
    roles: Sequence[str]
    messages: List[List]
    offset: int
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE
    sep: str = "###"
    sep2: Optional[str] = None
    version: str = "Unknown"
    stop_str: Optional[str] = None
    system_template: Optional[str] = None
    system_message: Optional[str] = None
    name: Optional[str] = None
    sep_offset: int = 0

    def __post_init__(self):
        if self.system_template is not None:
            self.system = self.system_template.format(
                system_message=self.system_message
            )

    # ------------------------------------------------------------------
    # Rendering
    # ------------------------------------------------------------------
    def get_prompt(self) -> str:
        messages = self.messages
        # Legacy image-tuple handling for the first message
        # (reference: conversation.py:45-55).
        if len(messages) > 0 and isinstance(messages[0][1], tuple):
            messages = [list(m) for m in self.messages]
            init_role, init_msg = messages[0]
            init_text = init_msg[0].replace("<image>", "").strip()
            if "mmtag" in self.version:
                messages[0] = [init_role, init_text]
                messages.insert(0, [self.roles[0], "<Image><image></Image>"])
                messages.insert(1, [self.roles[1], "Received."])
            else:
                messages[0] = [init_role, "<image>" + init_text]

        style = self.sep_style
        if style == SeparatorStyle.SINGLE:
            ret = self.system + self.sep
            for role, message in messages:
                if message:
                    ret += role + ": " + _msg_text(message) + self.sep
                else:
                    ret += role + ":"
        elif style == SeparatorStyle.TWO:
            seps = [self.sep, self.sep2]
            ret = self.system + seps[0]
            for i, (role, message) in enumerate(messages):
                if message:
                    ret += role + ": " + _msg_text(message) + seps[i % 2]
                else:
                    ret += role + ":"
        elif style == SeparatorStyle.MPT:
            ret = self.system + self.sep
            for role, message in messages:
                if message:
                    ret += role + _msg_text(message) + self.sep
                else:
                    ret += role
        elif style == SeparatorStyle.LLAMA_2:
            def wrap_sys(msg):
                return f"<<SYS>>\n{msg}\n<</SYS>>\n\n"

            def wrap_inst(msg):
                return f"[INST] {msg} [/INST]"

            ret = ""
            for i, (role, message) in enumerate(messages):
                if i == 0:
                    assert message, "first message should not be none"
                    assert role == self.roles[0], "first message should come from user"
                if message:
                    message = _msg_text(message)
                    if i == 0:
                        message = wrap_sys(self.system) + message
                    if i % 2 == 0:
                        ret += self.sep + wrap_inst(message)
                    else:
                        ret += " " + message + " " + self.sep2
            ret = ret.lstrip(self.sep)
        elif style == SeparatorStyle.LLAMA_3:
            ret = self.system + self.sep
            for role, message in messages:
                if message:
                    ret += (
                        f"<|start_header_id|>{role}<|end_header_id|>\n\n"
                        + _msg_text(message)
                        + self.sep
                    )
                else:
                    ret += f"<|start_header_id|>{role}<|end_header_id|>\n\n"
        elif style == SeparatorStyle.MFUYU:
            seps = [self.sep, self.sep2]
            ret = self.system + "\n"
            for i, (role, message) in enumerate(messages):
                if message:
                    ret += role + ": " + _msg_text(message) + seps[i % 2]
                else:
                    ret += role + ":"
        elif style == SeparatorStyle.PLAIN:
            seps = [self.sep, self.sep2]
            ret = self.system
            for i, (role, message) in enumerate(messages):
                if message:
                    ret += _msg_text(message) + seps[i % 2]
        elif style == SeparatorStyle.IDEFICS_2:
            ret = self.system + self.sep if self.system else ""
            for role, message in messages:
                if message:
                    ret += role + ":" + _msg_text(message) + self.sep + "\n"
                else:
                    ret += role + ":"
        elif style == SeparatorStyle.IDEFICS_3:
            ret = "<|begin_of_text|>"
            if self.system:
                ret += self.system + self.sep
            for role, message in messages:
                if message:
                    ret += role + ":" + _msg_text(message) + self.sep + "\n"
                else:
                    ret += role + ":"
        elif style == SeparatorStyle.QWEN2VL:
            if self.system:
                ret = "<|im_start|>system\n" + self.system + "<|im_end|>\n"
            else:
                ret = ""
            for role, message in messages:
                if message:
                    message = _msg_text(message)
                    message = message.replace(
                        "<image>", "<|vision_start|><|image_pad|><|vision_end|>"
                    )
                    message = message.replace(
                        "<video>", "<|vision_start|><|video_pad|><|vision_end|>"
                    )
                    ret += f"<|im_start|>{role}\n" + message + "<|im_end|>\n"
                else:
                    ret += f"<|im_start|>{role}\n"
        else:
            raise ValueError(f"Invalid style: {self.sep_style}")
        return ret

    # ------------------------------------------------------------------
    # Mutation / copy
    # ------------------------------------------------------------------
    def append_message(self, role: str, message) -> None:
        self.messages.append([role, message])

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system,
            roles=self.roles,
            messages=[[r, m] for r, m in self.messages],
            offset=self.offset,
            sep_style=self.sep_style,
            sep=self.sep,
            sep2=self.sep2,
            version=self.version,
            stop_str=self.stop_str,
            system_template=self.system_template,
            system_message=self.system_message,
            name=self.name,
            sep_offset=self.sep_offset,
        )

    def dict(self) -> Dict:
        return {
            "system": self.system,
            "roles": list(self.roles),
            "messages": [
                [r, m[0] if isinstance(m, tuple) else m] for r, m in self.messages
            ],
            "offset": self.offset,
            "sep": self.sep,
            "sep2": self.sep2,
        }


# ---------------------------------------------------------------------------
# Template registry (reference: conversation.py:300-643)
# ---------------------------------------------------------------------------

conv_vicuna_v0 = Conversation(
    system=(
        "A chat between a curious human and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the human's "
        "questions."
    ),
    roles=("Human", "Assistant"),
    # Few-shot seed exchange carried by the reference template
    # (reference: conversation.py:300-329); offset=2 skips it in UI views.
    messages=[
        [
            "Human",
            "What are the key differences between renewable and non-renewable "
            "energy sources?",
        ],
        [
            "Assistant",
            "Renewable energy sources are those that can be replenished naturally "
            "in a relatively short amount of time, such as solar, wind, hydro, "
            "geothermal, and biomass. Non-renewable energy sources, on the other "
            "hand, are finite and will eventually be depleted, such as coal, oil, "
            "and natural gas. Here are some key differences between renewable and "
            "non-renewable energy sources:\n"
            "1. Availability: Renewable energy sources are virtually inexhaustible, "
            "while non-renewable energy sources are finite and will eventually run "
            "out.\n"
            "2. Environmental impact: Renewable energy sources have a much lower "
            "environmental impact than non-renewable sources, which can lead to "
            "air and water pollution, greenhouse gas emissions, and other negative "
            "effects.\n"
            "3. Cost: Renewable energy sources can be more expensive to initially "
            "set up, but they typically have lower operational costs than "
            "non-renewable sources.\n"
            "4. Reliability: Renewable energy sources are often more reliable and "
            "can be used in more remote locations than non-renewable sources.\n"
            "5. Flexibility: Renewable energy sources are often more flexible and "
            "can be adapted to different situations and needs, while non-renewable "
            "sources are more rigid and inflexible.\n"
            "6. Sustainability: Renewable energy sources are more sustainable over "
            "the long term, while non-renewable sources are not, and their "
            "depletion can lead to economic and social instability.\n",
        ],
    ],
    offset=2,
    sep_style=SeparatorStyle.SINGLE,
    sep="###",
)

conv_vicuna_v1 = Conversation(
    system=(
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's "
        "questions."
    ),
    roles=("USER", "ASSISTANT"),
    version="v1",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
)

conv_llama_2 = Conversation(
    system=(
        "You are a helpful, respectful and honest assistant. Always answer as "
        "helpfully as possible, while being safe.  Your answers should not include "
        "any harmful, unethical, racist, sexist, toxic, dangerous, or illegal "
        "content. Please ensure that your responses are socially unbiased and "
        "positive in nature.\n\nIf a question does not make any sense, or is not "
        "factually coherent, explain why instead of answering something not "
        "correct. If you don't know the answer to a question, please don't share "
        "false information."
    ),
    roles=("USER", "ASSISTANT"),
    version="llama_v2",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.LLAMA_2,
    sep="<s>",
    sep2="</s>",
)

conv_llava_llama_2 = Conversation(
    system=(
        "You are a helpful language and vision assistant. "
        "You are able to understand the visual content that the user provides, "
        "and assist the user with a variety of tasks using natural language."
    ),
    roles=("USER", "ASSISTANT"),
    version="llama_v2",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.LLAMA_2,
    sep="<s>",
    sep2="</s>",
)

conv_mpt = Conversation(
    system=(
        "<|im_start|>system\nA conversation between a user and an LLM-based AI "
        "assistant. The assistant gives helpful and honest answers."
    ),
    roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
    version="mpt",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.MPT,
    sep="<|im_end|>",
)

conv_llava_plain = Conversation(
    system="",
    roles=("", ""),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.PLAIN,
    sep="\n",
)

conv_llava_v0 = Conversation(
    system=(
        "A chat between a curious human and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the human's "
        "questions."
    ),
    roles=("Human", "Assistant"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.SINGLE,
    sep="###",
)

conv_llava_v0_mmtag = Conversation(
    system=(
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant is able to understand the visual content that the user "
        "provides, and assist the user with a variety of tasks using natural "
        "language.The visual content will be provided with the following format: "
        "<Image>visual content</Image>."
    ),
    roles=("Human", "Assistant"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.SINGLE,
    sep="###",
    version="v0_mmtag",
)

conv_llava_v1 = Conversation(
    system=(
        "A chat between a curious human and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the human's "
        "questions."
    ),
    roles=("USER", "ASSISTANT"),
    version="v1",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
)

conv_llava_v1_mmtag = Conversation(
    system=(
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant is able to understand the visual content that the user "
        "provides, and assist the user with a variety of tasks using natural "
        "language.The visual content will be provided with the following format: "
        "<Image>visual content</Image>."
    ),
    roles=("USER", "ASSISTANT"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
    version="v1_mmtag",
)

conv_mfuyu_v1 = Conversation(
    system=(
        "You are a helpful language and vision assistant. "
        "You are able to understand the visual content that the user provides, "
        "and assist the user with a variety of tasks using natural language."
    ),
    roles=("USER", "ASSISTANT"),
    version="v1",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.MFUYU,
    sep="<0x04>",  # begin-of-answer token
    sep2="|ENDOFTEXT|",
)

conv_mllava_v1_mmtag = Conversation(
    system=(
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant is able to understand the multiple visual contents that "
        "the user provides, and assist the user with a variety of tasks using "
        "natural language.Each visual content will be provided with the following "
        "format: <Image>visual content</Image>."
    ),
    roles=("USER", "ASSISTANT"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.SINGLE,
    sep="</s>",
    version="v1_mmtag",
)

conv_mllava_v1 = Conversation(
    system=(
        "A chat between a curious human and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the human's "
        "questions."
    ),
    roles=("USER", "ASSISTANT"),
    version="v1",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.SINGLE,
    sep="</s>",
)

conv_llama_3 = Conversation(
    system=(
        "<|start_header_id|>system<|end_header_id|>\n\nYou are a pirate chatbot "
        "who always responds in pirate speak!"
    ),
    roles=("user", "assistant"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.LLAMA_3,
    sep="<|eot_id|>",
)

conv_idefics_2 = Conversation(
    system="",
    roles=("User", "Assistant"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.IDEFICS_2,
    sep="<end_of_utterance>",
)

conv_idefics_3 = Conversation(
    system="",
    roles=("User", "Assistant"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.IDEFICS_3,
    sep="<end_of_utterance>",
)

conv_qwen2_vl = Conversation(
    system="You are a helpful assistant.",
    roles=("user", "assistant"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.QWEN2VL,
    sep="<|im_end|>",
)

conv_openflamingo = Conversation(
    system="",
    roles=("User", "Assistant"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.IDEFICS_2,
    sep="<|endofchunk|>",
)

conv_videollava = Conversation(
    system=(
        "A chat between a curious human and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the human's "
        "questions."
    ),
    roles=("USER", "ASSISTANT"),
    version="v1",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
)

default_conversation = conv_mfuyu_v1

conv_templates: Dict[str, Conversation] = {
    "default": conv_vicuna_v0,
    "v0": conv_vicuna_v0,
    "v1": conv_vicuna_v1,
    "vicuna_v1": conv_vicuna_v1,
    "llama_2": conv_llama_2,
    "qwen2_vl": conv_qwen2_vl,
    "plain": conv_llava_plain,
    "v0_plain": conv_llava_plain,
    "llava_v0": conv_llava_v0,
    "v0_mmtag": conv_llava_v0_mmtag,
    "llava_v1": conv_llava_v1,
    "v1_mmtag": conv_llava_v1_mmtag,
    "llava_llama_2": conv_llava_llama_2,
    "llama_3": conv_llama_3,
    "mllava_v1": conv_mllava_v1,
    "mllava_v1_mmtag": conv_mllava_v1_mmtag,
    "idefics_2": conv_idefics_2,
    "idefics_3": conv_idefics_3,
    "mfuyu_v1": conv_mfuyu_v1,
    "openflamingo": conv_openflamingo,
    "videollava": conv_videollava,
    "mpt": conv_mpt,
}


def register_conv_template(template: Conversation, override: bool = False) -> None:
    """Register a named conversation template (reference: conversation.py:562-569)."""
    if not override:
        assert template.name not in conv_templates, (
            f"{template.name} has been registered."
        )
    conv_templates[template.name] = template


# ChatML-family templates for the InternVL / InternLM2 path
# (reference: conversation.py:576-642).  Hermes-2 and internlm2-chat render
# identically; they differ only in the training-time BOS handling, expressed
# here via sep_offset used by label masking.
register_conv_template(
    Conversation(
        name="Hermes-2",
        system_template="<|im_start|>system\n{system_message}",
        system_message=(
            "你是由上海人工智能实验室联合商汤科技开发的书生多模态大模型，英文名叫"
            "InternVL, 是一个有用无害的人工智能助手。"
        ),
        roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
        sep_style=SeparatorStyle.MPT,
        sep="<|im_end|>",
        stop_str="<|endoftext|>",
        system=None,
        messages=[],
        offset=0,
    )
)

register_conv_template(
    Conversation(
        name="internlm2-chat",
        system_template="<|im_start|>system\n{system_message}",
        system_message=(
            "你是由上海人工智能实验室联合商汤科技开发的书生多模态大模型，英文名叫"
            "InternVL, 是一个有用无害的人工智能助手。"
        ),
        roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
        sep_style=SeparatorStyle.MPT,
        sep="<|im_end|>",
        system=None,
        messages=[],
        offset=0,
        sep_offset=5,
    )
)

register_conv_template(
    Conversation(
        name="phi3-chat",
        system_template="<|system|>\n{system_message}",
        system_message=(
            "你是由上海人工智能实验室联合商汤科技开发的书生多模态大模型，英文名叫"
            "InternVL, 是一个有用无害的人工智能助手。"
        ),
        roles=("<|user|>\n", "<|assistant|>\n"),
        sep_style=SeparatorStyle.MPT,
        sep="<|end|>",
        system=None,
        messages=[],
        offset=0,
    )
)

register_conv_template(
    Conversation(
        name="internvl2_5",
        system_template="<|im_start|>system\n{system_message}",
        system_message=(
            "你是书生·万象，英文名是InternVL，是由上海人工智能实验室、清华大学及"
            "多家合作单位联合开发的多模态大语言模型。"
        ),
        roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
        sep_style=SeparatorStyle.MPT,
        sep="<|im_end|>\n",
        system=None,
        messages=[],
        offset=0,
        sep_offset=5,
    )
)
