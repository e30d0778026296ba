#!/usr/bin/env python
"""Neural3DVideo preprocessing: extract per-camera frames from .mp4 videos.

Equivalent of the reference ``video_script.py`` (cv2.VideoCapture loop). This
environment has no OpenCV; frames are extracted with the ffmpeg binary when
available, otherwise the script explains what to run.

Usage: python video_script.py <scene_dir>   # scene_dir contains cam*.mp4
"""
import shutil
import subprocess
import sys
from pathlib import Path


def extract_frames(scene_dir):
    scene_dir = Path(scene_dir)
    videos = sorted(scene_dir.glob("cam*.mp4"))
    if not videos:
        print(f"no cam*.mp4 under {scene_dir}")
        return
    ffmpeg = shutil.which("ffmpeg")
    for video in videos:
        out_dir = scene_dir / video.stem
        out_dir.mkdir(exist_ok=True)
        if ffmpeg:
            subprocess.run([ffmpeg, "-i", str(video), "-start_number", "0",
                            str(out_dir / "%05d.png")], check=True)
            print(f"{video.name} → {out_dir}/")
        else:
            print(f"ffmpeg not found; run manually:\n"
                  f"  ffmpeg -i {video} -start_number 0 {out_dir}/%05d.png")


if __name__ == "__main__":
    extract_frames(sys.argv[1] if len(sys.argv) > 1 else ".")
