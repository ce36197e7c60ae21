"""Extract per-frame label-filt PNGs matching exported color frames.

Parity tool for /root/reference/tools/unzip_label_filt.py, with the
hardcoded machine paths replaced by arguments. For every scene under
--extract_root that has a color/ export, pulls label-filt/<frame>.png from
<scene>_2d-label-filt.zip in --label_root into the scene folder — only the
frames that were actually exported (frame_skip subset), not the whole zip.
"""
import argparse
import os
import traceback
import zipfile
from pathlib import Path


def extract_scene(scene_dir: Path, label_zip: Path) -> int:
    imgs = sorted(os.listdir(scene_dir / "color"))
    n = 0
    with zipfile.ZipFile(label_zip, "r") as zf:
        for img in imgs:
            member = f"label-filt/{Path(img).stem}.png"
            try:
                zf.extract(member, scene_dir)
                n += 1
            except KeyError:
                print(f"{scene_dir.name}: missing {member}")
            except Exception:
                traceback.print_exc()
                print(scene_dir.name)
    return n


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--label_root", required=True,
                    help="root holding <scene>/<scene>_2d-label-filt.zip")
    ap.add_argument("--extract_root", required=True,
                    help="root of exported scenes (each with color/)")
    ap.add_argument("--split", default="", help="optional subdir (train/val)")
    args = ap.parse_args()

    ex_root = Path(args.extract_root) / args.split
    lb_root = Path(args.label_root) / args.split
    scenes = sorted(p for p in ex_root.iterdir() if (p / "color").is_dir())
    for scene_dir in scenes:
        zip_path = lb_root / scene_dir.name / f"{scene_dir.name}_2d-label-filt.zip"
        if not zip_path.exists():
            print(f"{scene_dir.name}: no label zip at {zip_path}")
            continue
        n = extract_scene(scene_dir, zip_path)
        print(f"{scene_dir.name}: extracted {n} labels")


if __name__ == "__main__":
    main()
