"""Golden tests for conversation template rendering.

Expected strings are derived from the reference rendering rules
(reference: mantis/models/conversation.py:43-177); any drift here changes
tokenization and therefore label masking and model behavior.
"""

from mantis_tpu.models.conversation import (
    SeparatorStyle,
    conv_templates,
)


def _render(name, turns):
    conv = conv_templates[name].copy()
    conv.messages = []
    for role, msg in turns:
        conv.append_message(role, msg)
    return conv.get_prompt()


def test_llama3_prompt():
    conv = conv_templates["llama_3"]
    out = _render(
        "llama_3",
        [(conv.roles[0], "Describe <image>."), (conv.roles[1], "")],
    )
    expected = (
        "<|start_header_id|>system<|end_header_id|>\n\nYou are a pirate chatbot "
        "who always responds in pirate speak!<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nDescribe <image>.<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
    )
    assert out == expected


def test_llama3_full_turns():
    conv = conv_templates["llama_3"]
    out = _render(
        "llama_3",
        [
            (conv.roles[0], "hi"),
            (conv.roles[1], "hello!"),
            (conv.roles[0], "bye"),
            (conv.roles[1], ""),
        ],
    )
    expected = (
        "<|start_header_id|>system<|end_header_id|>\n\nYou are a pirate chatbot "
        "who always responds in pirate speak!<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nhi<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\nhello!<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nbye<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
    )
    assert out == expected


def test_mllava_v1_single_style():
    out = _render("mllava_v1", [("USER", "What is this?"), ("ASSISTANT", "")])
    expected = (
        "A chat between a curious human and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite answers "
        "to the human's questions.</s>"
        "USER: What is this?</s>ASSISTANT:"
    )
    assert out == expected


def test_vicuna_v1_two_style():
    out = _render("v1", [("USER", "hi"), ("ASSISTANT", "yo"), ("USER", "ok"),
                         ("ASSISTANT", "")])
    expected = (
        "A chat between a curious user and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite answers "
        "to the user's questions. "
        "USER: hi ASSISTANT: yo</s>USER: ok ASSISTANT:"
    )
    assert out == expected


def test_mfuyu_style():
    conv = conv_templates.get("mfuyu")
    from mantis_tpu.models.conversation import conv_mfuyu_v1
    conv = conv_mfuyu_v1.copy()
    conv.messages = []
    conv.append_message("USER", "look <image>")
    conv.append_message("ASSISTANT", "")
    out = conv.get_prompt()
    expected = (
        "You are a helpful language and vision assistant. You are able to "
        "understand the visual content that the user provides, and assist the "
        "user with a variety of tasks using natural language.\n"
        "USER: look <image><0x04>ASSISTANT:"
    )
    assert out == expected


def test_idefics2_style():
    out = _render("idefics_2", [("User", "hey"), ("Assistant", "")])
    assert out == "User:hey<end_of_utterance>\nAssistant:"


def test_idefics3_style():
    out = _render("idefics_3", [("User", "hey"), ("Assistant", "")])
    assert out == "<|begin_of_text|>User:hey<end_of_utterance>\nAssistant:"


def test_qwen2vl_style_rewrites_media_tokens():
    out = _render(
        "qwen2_vl",
        [("user", "see <image> and <video>"), ("assistant", "")],
    )
    expected = (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\nsee <|vision_start|><|image_pad|><|vision_end|> and "
        "<|vision_start|><|video_pad|><|vision_end|><|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    assert out == expected


def test_plain_style():
    # The reference's PLAIN template carries sep2=None and is only rendered
    # via the manual pretraining path (reference: data.py:382-396), which
    # appends text + conv.sep; even-indexed messages use sep.
    out = _render("plain", [("", "<image> a photo of a cat")])
    assert out == "<image> a photo of a cat\n"


def test_mpt_internvl_templates():
    conv = conv_templates["internvl2_5"].copy()
    conv.messages = []
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], "")
    out = conv.get_prompt()
    expected = (
        "<|im_start|>system\n你是书生·万象，英文名是InternVL，是由上海人工智能"
        "实验室、清华大学及多家合作单位联合开发的多模态大语言模型。<|im_end|>\n"
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    assert out == expected
    assert conv.sep_offset == 5


def test_registry_contents():
    for name in [
        "default", "v0", "v1", "vicuna_v1", "llama_2", "qwen2_vl", "plain",
        "v0_plain", "llava_v0", "v0_mmtag", "llava_v1", "v1_mmtag",
        "llava_llama_2", "llama_3", "mllava_v1", "mllava_v1_mmtag",
        "idefics_2", "idefics_3", "openflamingo", "videollava", "mpt",
        "Hermes-2", "internlm2-chat", "phi3-chat", "internvl2_5",
    ]:
        assert name in conv_templates, name


def test_copy_is_deep_for_messages():
    conv = conv_templates["llama_3"].copy()
    conv.messages = []
    conv.append_message("user", "a")
    conv2 = conv.copy()
    conv2.messages[0][1] = "b"
    assert conv.messages[0][1] == "a"


def test_separator_styles_complete():
    assert {s.name for s in SeparatorStyle} == {
        "SINGLE", "TWO", "MPT", "PLAIN", "LLAMA_2", "LLAMA_3",
        "IDEFICS_2", "IDEFICS_3", "MFUYU", "QWEN2VL",
    }
