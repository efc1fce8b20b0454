#!/usr/bin/env bash
# Build the reference-tokenizer probe binary in a scratch dir (offline).
#
# The reference crate is copied to $BUILD_DIR — it never enters this repo.
# crates.io is unreachable here, so lazy_static is replaced by a 9-line local
# stub whose lazy_static! macro expands to std::sync::LazyLock statics
# (semantics-identical for the reference's single use).  Recipe per
# SURVEY.md §5.3.
set -euo pipefail

BUILD_DIR="${1:-/tmp/refprobe}"
REF=/root/reference
HERE="$(cd "$(dirname "$0")" && pwd)"

rm -rf "$BUILD_DIR"
mkdir -p "$BUILD_DIR/refcrate" "$BUILD_DIR/lazy_static/src"

cp -r "$REF/src" "$BUILD_DIR/refcrate/src"
chmod -R u+w "$BUILD_DIR/refcrate"

# export Token so the probe binary can pattern-match on it
echo 'pub use tokenizer::Token;' >> "$BUILD_DIR/refcrate/src/lib.rs"

# probe-only constructor appended to the COPIED mod.rs (never the repo):
# entry into the content states a WHATWG tree builder would select, so the
# RCDATA/RAWTEXT/script-data/PLAINTEXT families (unreachable from Data in
# the tokenizer-only reference) get true binary differentials.
cat >> "$BUILD_DIR/refcrate/src/tokenizer/mod.rs" <<'EOF'

// ---- appended by build_probe.sh (probe protocol v2) ----
impl<'a> Tokenizer<'a> {
    pub fn new_in_state(html: &'a str, state_name: &str) -> Self {
        let state = match state_name {
            "RCDATA" => State::RCDATA,
            "RAWTEXT" => State::RAWTEXT,
            "ScriptData" => State::ScriptData,
            "PLAINTEXT" => State::PLAINTEXT,
            "CDATASection" => State::CDATASection,
            _ => State::Data,
        };
        let mut scanner = Self {
            html: html.chars().peekable(),
            tokens: VecDeque::with_capacity(html.len()),
            current_state: state,
            return_state: State::Data,
            current_token: None,
            current_character: None,
            temporary_buffer: None,
            character_reference_code: 0,
            open_tags: Vec::new(),
            reconsume: false,
        };
        scanner.scan();
        scanner
    }
}
EOF

cat > "$BUILD_DIR/refcrate/Cargo.toml" <<'EOF'
[package]
name = "html-parser"
version = "0.1.0"
edition = "2021"

[lib]
name = "html_parser"
path = "src/lib.rs"

[[bin]]
name = "probe"
path = "src/bin/probe.rs"

[dependencies]
lazy_static = { path = "../lazy_static" }
EOF

cat > "$BUILD_DIR/lazy_static/Cargo.toml" <<'EOF'
[package]
name = "lazy_static"
version = "1.4.0"
edition = "2021"
EOF

cat > "$BUILD_DIR/lazy_static/src/lib.rs" <<'EOF'
// Minimal offline stand-in: expands `lazy_static!` to LazyLock statics.
#[macro_export]
macro_rules! lazy_static {
    ($(static ref $N:ident : $T:ty = $e:expr;)+) => {
        $(static $N: std::sync::LazyLock<$T> = std::sync::LazyLock::new(|| $e);)+
    };
}
EOF

mkdir -p "$BUILD_DIR/refcrate/src/bin"
cp "$HERE/probe_main.rs" "$BUILD_DIR/refcrate/src/bin/probe.rs"

cd "$BUILD_DIR/refcrate"
cargo build --release --offline 2>&1 | tail -3
touch "$BUILD_DIR/protocol_v3"   # diff_runner rebuilds stale probes
echo "probe: $BUILD_DIR/refcrate/target/release/probe"
