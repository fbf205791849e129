"""Voice allocation, note scheduling, and the MIDI file reader."""

import struct

import numpy as np
import pytest

from signals_tpu.nodes.env import ADSR
from signals_tpu.nodes.fx import RingMod
from signals_tpu.nodes.osc import Sine
from signals_tpu.nodes.seq import GateSeq, PitchSeq
from signals_tpu.parallel.voices import (
    Note,
    allocate_voices,
    midi_to_hz,
    score_tracks,
    sequenced_poly,
)
from signals_tpu.utils.midifile import BadMidiFile, read_midi

RATE = 44100
F = 256


# --- allocation ---------------------------------------------------------


def test_chord_spreads_over_voices():
    chord = [Note(0.0, 1.0, hz) for hz in (220.0, 330.0, 440.0)]
    voices = allocate_voices(chord, 4)
    non_empty = [v for v in voices if v]
    assert len(non_empty) == 3
    assert sorted(v[0].hz for v in non_empty) == [220.0, 330.0, 440.0]


def test_sequential_notes_respect_release_tail():
    notes = [Note(0.0, 0.1, 220.0), Note(0.15, 0.1, 330.0)]
    # without release headroom the second note reuses voice 0
    assert [len(v) for v in allocate_voices(notes, 2)] == [2, 0]
    # a 0.1 s release keeps voice 0 busy until 0.2 s -> second voice
    assert [len(v) for v in allocate_voices(notes, 2, release=0.1)] == [1, 1]


def test_stealing_clips_the_held_note():
    notes = [Note(0.0, 1.0, 220.0), Note(0.1, 1.0, 330.0),
             Note(0.2, 0.5, 440.0)]
    voices = allocate_voices(notes, 2)
    stolen = voices[0][0]          # earliest-freeing voice gets stolen
    assert stolen.hz == 220.0
    assert stolen.end == pytest.approx(0.2)      # clipped to the new start
    assert voices[0][1].hz == 440.0
    # voices never hold overlapping notes
    for v in voices:
        for a, b in zip(v, v[1:]):
            assert a.end <= b.start + 1e-9


def test_bad_inputs():
    with pytest.raises(ValueError):
        allocate_voices([Note(0.0, 0.0, 220.0)], 2)
    with pytest.raises(ValueError):
        allocate_voices([], 0)


# --- track building -----------------------------------------------------


def test_score_tracks_shapes_and_padding():
    voices = [[Note(0.0, 0.1, 220.0, 0.5), Note(0.2, 0.1, 330.0)],
              [Note(0.05, 0.1, 440.0)],
              []]
    tr = score_tracks(voices, rate=RATE)
    assert tr['starts'].shape == (3, 1, 2)
    assert tr['starts'][0, 0, 0] == 0.0
    assert tr['ends'][0, 0, 1] == pytest.approx(0.3 * RATE)
    # pads: never gate-active, hold the voice's first pitch
    assert tr['starts'][1, 0, 1] == tr['ends'][1, 0, 1] == -1e9
    assert tr['values'][1, 0, 1] == 440.0
    assert tr['velocities'][0, 0, 0] == 0.5
    # an empty voice is all pads with silent values
    assert (tr['values'][2] == 0.0).all()
    assert (tr['ends'][2] == -1e9).all()


# --- end-to-end ---------------------------------------------------------


def _mono_synth():
    gate = GateSeq()
    pitch = PitchSeq()
    osc = Sine()
    osc.hertz = pitch
    env = ADSR()
    env.gate = gate
    st = env.get_state()
    st.attack, st.decay, st.sustain, st.release = 0.002, 0.01, 0.8, 0.01
    out = RingMod()
    out.left = osc
    out.right = env
    return out, gate, pitch


def _dominant_hz(audio, a, b):
    seg = audio[int(a * RATE):int(b * RATE), 0]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    return np.fft.rfftfreq(len(seg), 1 / RATE)[spec.argmax()]


def test_sequenced_poly_plays_a_chord_and_a_melody():
    notes = [Note(0.00, 0.28, 220.0),            # held under the melody
             Note(0.00, 0.08, 660.0),
             Note(0.12, 0.08, 880.0)]
    root, gate, pitch = _mono_synth()
    poly = sequenced_poly(root, gate=gate, pitch=pitch, notes=notes,
                          n_voices=3, rate=RATE, block_frames=F,
                          channels=1)
    n_blocks = int(0.3 * RATE) // F
    audio, _ = poly.render(n_blocks=n_blocks)

    # both chord pitches present at t=0.04
    seg = audio[:int(0.08 * RATE), 0]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / RATE)
    peak_at = lambda hz: spec[np.abs(freqs - hz) < 30].max()
    floor = spec.mean()
    assert peak_at(220.0) > 10 * floor
    assert peak_at(660.0) > 10 * floor
    # melody note replaces the 660 at t=0.12..0.20 (220 still held)
    assert peak_at(880.0) < spec[np.abs(freqs - 880.0) > 0].max() * 10
    seg2 = audio[int(0.13 * RATE):int(0.19 * RATE), 0]
    spec2 = np.abs(np.fft.rfft(seg2 * np.hanning(len(seg2))))
    freqs2 = np.fft.rfftfreq(len(seg2), 1 / RATE)
    assert spec2[np.abs(freqs2 - 880.0) < 40].max() > 10 * spec2.mean()
    # silence after everything releases
    assert np.abs(audio[int(0.295 * RATE):]).max() < 1e-3


def test_sequenced_poly_velocity_track():
    notes = [Note(0.00, 0.1, 440.0, velocity=1.0),
             Note(0.15, 0.1, 440.0, velocity=0.25)]
    root, gate, pitch = _mono_synth()
    vel = PitchSeq()
    amp = RingMod()
    amp.left = root
    amp.right = vel
    poly = sequenced_poly(amp, gate=gate, pitch=pitch, velocity=vel,
                          notes=notes, n_voices=2, rate=RATE,
                          block_frames=F, channels=1)
    audio, _ = poly.render(n_blocks=int(0.3 * RATE) // F)
    loud = np.abs(audio[int(0.03 * RATE):int(0.09 * RATE)]).max()
    quiet = np.abs(audio[int(0.18 * RATE):int(0.24 * RATE)]).max()
    assert quiet == pytest.approx(loud * 0.25, rel=0.1)


# --- MIDI files ---------------------------------------------------------


def _varlen(v):
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(reversed(out))


def _track_chunk(events):
    """events: (delta_ticks, bytes) pairs; end-of-track appended."""
    body = b''.join(_varlen(d) + e for d, e in events)
    body += _varlen(0) + b'\xff\x2f\x00'
    return b'MTrk' + struct.pack('>I', len(body)) + body


def _smf(tracks, *, fmt=1, tpq=480):
    head = b'MThd' + struct.pack('>IHHH', 6, fmt, len(tracks), tpq)
    return head + b''.join(tracks)


def test_read_midi_basic(tmp_path):
    # 120 bpm (default): 480 ticks = one quarter = 0.5 s
    trk = _track_chunk([
        (0, b'\x90\x45\x64'),          # A4 on, vel 100
        (480, b'\x80\x45\x00'),        # off after 0.5 s
        (240, b'\x90\x40\x50'),        # E4 on at 0.75 s
        (240, b'\x40\x00'),            # running status: vel-0 note-off
    ])
    path = tmp_path / 't.mid'
    path.write_bytes(_smf([trk], fmt=0))
    notes = read_midi(path)
    assert len(notes) == 2
    assert notes[0].hz == pytest.approx(440.0)
    assert notes[0].start == pytest.approx(0.0)
    assert notes[0].dur == pytest.approx(0.5)
    assert notes[0].velocity == pytest.approx(100 / 127)
    assert notes[1].hz == pytest.approx(midi_to_hz(0x40))
    assert notes[1].start == pytest.approx(0.75)
    assert notes[1].dur == pytest.approx(0.25)


def test_read_midi_tempo_map_across_tracks(tmp_path):
    tempo = _track_chunk([
        (0, b'\xff\x51\x03' + (250000).to_bytes(3, 'big')),   # 240 bpm
        (960, b'\xff\x51\x03' + (500000).to_bytes(3, 'big')),  # 120 bpm
    ])
    melody = _track_chunk([
        (480, b'\x90\x45\x7f'),        # on at 480 ticks = 0.25 s (fast)
        (960, b'\x80\x45\x00'),        # off at 1440: 480 fast + 480 slow
    ])
    path = tmp_path / 'tempo.mid'
    path.write_bytes(_smf([tempo, melody]))
    (note,) = read_midi(path)
    assert note.start == pytest.approx(0.25)
    assert note.dur == pytest.approx(0.25 + 0.5)


def test_read_midi_hanging_note_and_channel_filter(tmp_path):
    trk = _track_chunk([
        (0, b'\x90\x45\x40'),          # ch 0
        (0, b'\x99\x24\x40'),          # ch 9 (drums)
        (480, b'\x89\x24\x00'),        # drum off; A4 left hanging
    ])
    path = tmp_path / 'h.mid'
    path.write_bytes(_smf([trk], fmt=0))
    notes = read_midi(path)
    assert len(notes) == 2             # hanging note closed at EOF
    melodic = read_midi(path, include_channels={0})
    assert len(melodic) == 1
    assert melodic[0].dur == pytest.approx(0.5)


def test_read_midi_rejects_garbage(tmp_path):
    path = tmp_path / 'bad.mid'
    path.write_bytes(b'RIFFxxxx')
    with pytest.raises(BadMidiFile):
        read_midi(path)


def test_midi_to_sequenced_poly_roundtrip(tmp_path):
    trk = _track_chunk([
        (0, b'\x90\x45\x7f'),          # A4
        (0, b'\x90\x4c\x7f'),          # E5 — a fifth up, same time
        (480, b'\x80\x45\x00'),
        (0, b'\x80\x4c\x00'),
    ])
    path = tmp_path / 'chord.mid'
    path.write_bytes(_smf([trk], fmt=0))
    notes = read_midi(path)
    root, gate, pitch = _mono_synth()
    poly = sequenced_poly(root, gate=gate, pitch=pitch, notes=notes,
                          n_voices=4, rate=RATE, block_frames=F,
                          channels=1)
    audio, _ = poly.render(n_blocks=int(0.5 * RATE) // F)
    seg = audio[:int(0.4 * RATE), 0]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / RATE)
    for hz in (440.0, midi_to_hz(0x4c)):
        assert spec[np.abs(freqs - hz) < 20].max() > 10 * spec.mean()


def test_multichannel_seq_tracks_pull_vs_compiled():
    from signals_tpu.compiler import compile_node
    from conftest import pull_blocks

    g = GateSeq()
    st = g.get_state()
    st.starts = np.array([[0.0, 2000.0], [500.0, -1e9]], dtype=np.float32)
    st.ends = np.array([[400.0, 2400.0], [900.0, -1e9]], dtype=np.float32)
    assert g.channels == 2
    ref = pull_blocks(g, 12, block_frames=F, rate=RATE, channels=2)
    compiled = compile_node(g, block_frames=F, rate=RATE, channels=2)
    got, _ = compiled.render(n_blocks=12)
    np.testing.assert_array_equal(np.asarray(got), ref)
    assert ref[100, 0] == 1.0 and ref[100, 1] == 0.0
    assert ref[600, 0] == 0.0 and ref[600, 1] == 1.0

    p = PitchSeq()
    st = p.get_state()
    st.starts = np.array([[0.0, 1000.0], [-1e9, 500.0]], dtype=np.float32)
    st.ends = np.array([[400.0, 1400.0], [-1e9, 900.0]], dtype=np.float32)
    st.values = np.array([[220.0, 330.0], [110.0, 440.0]], dtype=np.float32)
    ref = pull_blocks(p, 12, block_frames=F, rate=RATE, channels=2)
    compiled = compile_node(p, block_frames=F, rate=RATE, channels=2)
    got, _ = compiled.render(n_blocks=12)
    np.testing.assert_array_equal(np.asarray(got), ref)
    assert ref[100, 0] == 220.0 and ref[100, 1] == 110.0   # ch1 pre-start hold
    assert ref[1200, 0] == 330.0 and ref[700, 1] == 440.0


def test_sequenced_poly_channels_layout_matches_vmap():
    notes = [Note(0.00, 0.28, 220.0),
             Note(0.00, 0.08, 660.0),
             Note(0.12, 0.08, 880.0)]
    audio = {}
    for layout in ('vmap', 'channels'):
        root, gate, pitch = _mono_synth()
        poly = sequenced_poly(root, gate=gate, pitch=pitch, notes=notes,
                              n_voices=3, rate=RATE, block_frames=F,
                              channels=1, layout=layout)
        audio[layout], _ = poly.render(n_blocks=int(0.3 * RATE) // F)
    assert np.abs(audio['vmap'] - audio['channels']).max() <= 1e-5
