"""Interactive multi-image chat CLI — the TPU equivalent of the
reference's examples/chat_mantis_cli.py.

Commands inside the loop:
  /image <path>   attach an image to the next message
  /clear          reset the conversation
  /quit           exit
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import argparse

from PIL import Image

from mantis_tpu.models.mllava import MantisLlava


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--stream", action="store_true")
    args = p.parse_args()
    model = MantisLlava.from_pretrained(args.model)
    history = None
    pending_images = []
    print("Mantis chat. /image <path> to attach, /clear, /quit.")
    while True:
        try:
            line = input("USER: ").strip()
        except EOFError:
            break
        if not line:
            continue
        if line == "/quit":
            break
        if line == "/clear":
            history, pending_images = None, []
            continue
        if line.startswith("/image "):
            pending_images.append(Image.open(line[7:].strip()))
            print(f"[{len(pending_images)} image(s) attached]")
            continue
        text = line + " " + "<image>" * len(pending_images) \
            if pending_images and "<image>" not in line else line
        if args.stream:
            print("ASSISTANT: ", end="", flush=True)
            chunks = []
            for piece in model.chat_stream(text, pending_images or None,
                                           history=history):
                print(piece, end="", flush=True)
                chunks.append(piece)
            print()
            reply = "".join(chunks)
            if history is None:
                history = []
            history += [
                {"role": "user", "text": text},
                {"role": "assistant", "text": reply},
            ]
        else:
            reply, history = model.chat(text, pending_images or None,
                                        history=history)
            print("ASSISTANT:", reply)
        pending_images = []


if __name__ == "__main__":
    main()
