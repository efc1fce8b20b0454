// Golden-generation probe for the reference tokenizer.
//
// Protocol (v3): one request per stdin line -> one JSON value per
// stdout line.  A request is either
//   base64(UTF-8 input)                      — tokenize from Data ->
//       JSON token array, Char runs coalesced into ["chars", data]
//       entries (the golden_tokens format from FIXTURES.md §2), or
//   STATE_NAME " " base64(UTF-8 input)       — tokenize from a content
// entry state (RCDATA / RAWTEXT / ScriptData / PLAINTEXT / CDATASection),
// exercising the state families unreachable from Data, or
//   "DISPLAY " base64(UTF-8 input)           — tokenize from Data and
//       emit ONE JSON string: the concatenation of the reference's own
//       `Display` serialization of every token (token.rs:20-24, 82-86,
//       163-181, 210-222 — `format!("{}", token)`), the value truth for
//       the display_roundtrip gate query.
// The driving Python harness enforces a per-input timeout because three
// reference states hang at EOF.
//
// This file is OUR code (committed); the reference crate itself is copied to
// a scratch dir at build time by build_probe.sh and never enters the repo.

use std::io::{self, BufRead, Write};

use html_parser::{Token, Tokenizer};

fn b64val(c: u8) -> Option<u8> {
    match c {
        b'A'..=b'Z' => Some(c - b'A'),
        b'a'..=b'z' => Some(c - b'a' + 26),
        b'0'..=b'9' => Some(c - b'0' + 52),
        b'+' => Some(62),
        b'/' => Some(63),
        _ => None,
    }
}

fn b64decode(s: &str) -> Vec<u8> {
    let mut out = Vec::new();
    let mut acc: u32 = 0;
    let mut nbits = 0;
    for &b in s.as_bytes() {
        if b == b'=' {
            break;
        }
        if let Some(v) = b64val(b) {
            acc = (acc << 6) | v as u32;
            nbits += 6;
            if nbits >= 8 {
                nbits -= 8;
                out.push((acc >> nbits) as u8);
            }
        }
    }
    out
}

fn jesc(s: &str, out: &mut String) {
    out.push('"');
    for c in s.chars() {
        match c {
            '"' => out.push_str("\\\""),
            '\\' => out.push_str("\\\\"),
            '\n' => out.push_str("\\n"),
            '\r' => out.push_str("\\r"),
            '\t' => out.push_str("\\t"),
            c if (c as u32) < 0x20 => {
                out.push_str(&format!("\\u{:04x}", c as u32));
            }
            c => out.push(c),
        }
    }
    out.push('"');
}

fn main() {
    let stdin = io::stdin();
    let stdout = io::stdout();
    let mut w = stdout.lock();
    for line in stdin.lock().lines() {
        let line = match line {
            Ok(l) => l,
            Err(_) => break,
        };
        let (state, b64) = match line.split_once(' ') {
            Some((s, rest)) => (Some(s.to_string()), rest.to_string()),
            None => (None, line),
        };
        let bytes = b64decode(&b64);
        let input = String::from_utf8_lossy(&bytes).into_owned();
        if state.as_deref() == Some("DISPLAY") {
            let mut tok = Tokenizer::new(&input);
            let mut disp = String::new();
            while let Some(t) = tok.next_token() {
                disp.push_str(&format!("{}", t));
            }
            let mut out = String::new();
            jesc(&disp, &mut out);
            let _ = writeln!(w, "{}", out);
            let _ = w.flush();
            continue;
        }
        let mut tok = match &state {
            Some(s) => Tokenizer::new_in_state(&input, s),
            None => Tokenizer::new(&input),
        };
        let mut out = String::from("[");
        let mut first = true;
        let mut chars_run = String::new();
        macro_rules! sep {
            () => {
                if first {
                    first = false;
                } else {
                    out.push(',');
                }
            };
        }
        macro_rules! flush_chars {
            () => {
                if !chars_run.is_empty() {
                    sep!();
                    out.push_str("[\"chars\",");
                    jesc(&chars_run, &mut out);
                    out.push(']');
                    chars_run.clear();
                }
            };
        }
        while let Some(t) = tok.next_token() {
            match t {
                Token::Char(c) => chars_run.push(c),
                Token::Tag(tag) => {
                    flush_chars!();
                    sep!();
                    out.push('[');
                    out.push_str(if tag.is_end_tag { "\"end\"" } else { "\"start\"" });
                    out.push(',');
                    jesc(&tag.tag_name, &mut out);
                    out.push_str(",[");
                    for (i, a) in tag.attributes.iter().enumerate() {
                        if i > 0 {
                            out.push(',');
                        }
                        out.push('[');
                        jesc(&a.name, &mut out);
                        out.push(',');
                        jesc(&a.value, &mut out);
                        out.push(']');
                    }
                    out.push_str("],");
                    out.push_str(if tag.self_closing { "true" } else { "false" });
                    out.push(']');
                }
                Token::Comment(c) => {
                    flush_chars!();
                    sep!();
                    out.push_str("[\"comment\",");
                    jesc(&c, &mut out);
                    out.push(']');
                }
                Token::DOCTYPE(d) => {
                    flush_chars!();
                    sep!();
                    out.push_str("[\"doctype\",");
                    jesc(&d.name, &mut out);
                    out.push(',');
                    match &d.public_id {
                        Some(p) => jesc(p, &mut out),
                        None => out.push_str("null"),
                    }
                    out.push(',');
                    match &d.system_id {
                        Some(s) => jesc(s, &mut out),
                        None => out.push_str("null"),
                    }
                    out.push(',');
                    out.push_str(if d.force_quirks { "true" } else { "false" });
                    out.push(']');
                }
                Token::EOF => {
                    flush_chars!();
                    sep!();
                    out.push_str("[\"eof\"]");
                }
            }
        }
        flush_chars!();
        out.push(']');
        let _ = writeln!(w, "{}", out);
        let _ = w.flush();
    }
}
