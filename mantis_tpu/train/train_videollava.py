"""Per-arch trainer entry (reference: mantis/train/train_videollava.py).

Thin shim over the generic multi-arch trainer with --arch preset to
'videollava'; the reference trains HF VideoLlavaForConditionalGeneration
with use_video_encoder=True — pass --use_video_encoder for the <video>
token path (frames through the video tower) on chat_video data.
"""

from mantis_tpu.train.train import main


if __name__ == "__main__":
    main(default_arch="videollava")
