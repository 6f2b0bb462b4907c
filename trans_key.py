"""Transpose note/f0 sequences in DiffSinger-style transcription files by a
number of semitones (reference trans_key.py).

    python trans_key.py --key -6 --in result.txt --out raw.txt
"""

import argparse

head_list = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"]


def trans_f0_seq(feature_pit, transform):
    feature_pit = feature_pit * 2 ** (transform / 12)
    return round(feature_pit, 1)


def move_key(raw_data, mv_key):
    """Shift a note name like 'A#4' by mv_key semitones; Python's floored
    divmod gives the octave carry in one step for either direction."""
    pitch_class, octave = raw_data[:-1], int(raw_data[-1])
    carry, idx = divmod(head_list.index(pitch_class) + mv_key, 12)
    return head_list[idx] + str(octave + carry)


def trans_key(raw_data, key):
    """Transpose a list of {'note_seq': ..., 'f0_seq': ...} dicts in place."""
    for i in raw_data:
        note_seq_list = i["note_seq"].split(" ")
        i["note_seq"] = " ".join(
            move_key(n, key) if n != "rest" else n for n in note_seq_list)
        f0_seq_list = [float(x) for x in i["f0_seq"].split(" ")]
        i["f0_seq"] = " ".join(str(trans_f0_seq(x, key)) for x in f0_seq_list)
    return raw_data


def trans_file(in_path, out_path, key):
    """Transpose column 3 (note_seq) of a |-separated transcription file."""
    with open(in_path, encoding="utf-8") as f, \
            open(out_path, "w", encoding="utf-8") as f_w:
        for raw in f.readlines():
            raw_list = raw.split("|")
            new_notes = []
            for note_seq in raw_list[3].split(" "):
                if note_seq != "rest":
                    note_seq = note_seq.split("/")[0] if "/" in note_seq else note_seq
                    new_notes.append(move_key(note_seq, key))
                else:
                    new_notes.append(note_seq)
            raw_list[3] = " ".join(new_notes)
            f_w.write("|".join(raw_list))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--key", type=int, default=-6)
    ap.add_argument("--in", dest="in_path", default="result.txt")
    ap.add_argument("--out", dest="out_path", default="raw.txt")
    args = ap.parse_args()
    trans_file(args.in_path, args.out_path, args.key)
