//! Cross-oracle harness: decode RLEv2 / boolean-RLE streams with the
//! REFERENCE implementation's OWN decoder source, included verbatim from
//! /root/reference (read-only). The Python test feeds bytes produced by
//! THIS ENGINE's encoders and asserts the reference decodes the original
//! values — live bidirectional parity, not just ported golden vectors.
//!
//! stdin protocol: [mode u8: b's'|b'u'|b'b'] [n u64 LE] [payload...]
//! stdout: one decoded value per line (i64 / u64 / 0|1), or "ERR <debug>".

mod error {
    /// Minimal shim of the reference's crate::error::Error — only the
    /// variants its decoder source uses (rle_v2.rs/boolean_rle.rs refer to
    /// OutOfSpec and the io::Error conversion).
    #[derive(Debug, Clone)]
    pub enum Error {
        OutOfSpec,
    }

    impl From<std::io::Error> for Error {
        fn from(_: std::io::Error) -> Self {
            Self::OutOfSpec
        }
    }
}

mod decode {
    #[inline]
    pub(crate) fn read_u8<R: std::io::Read>(reader: &mut R) -> Result<u8, std::io::Error> {
        let mut buf = [0; 1];
        reader.read_exact(&mut buf)?;
        Ok(buf[0])
    }

    pub mod rle_v2 {
        include!("/root/reference/src/read/decode/rle_v2.rs");
    }
    pub mod boolean_rle {
        include!("/root/reference/src/read/decode/boolean_rle.rs");
    }
}

use std::io::Read;

fn main() {
    let mut input = Vec::new();
    std::io::stdin().read_to_end(&mut input).unwrap();
    let mode = input[0];
    let n = u64::from_le_bytes(input[1..9].try_into().unwrap()) as usize;
    let payload = &input[9..];
    let reader = std::io::Cursor::new(payload);
    let mut out = String::new();
    match mode {
        b's' => {
            for item in decode::rle_v2::SignedRleV2Iter::new(reader, n, vec![]) {
                match item {
                    Ok(v) => out.push_str(&format!("{v}\n")),
                    Err(e) => {
                        println!("ERR {e:?}");
                        return;
                    }
                }
            }
        }
        b'u' => {
            for item in decode::rle_v2::UnsignedRleV2Iter::new(reader, n, vec![]) {
                match item {
                    Ok(v) => out.push_str(&format!("{v}\n")),
                    Err(e) => {
                        println!("ERR {e:?}");
                        return;
                    }
                }
            }
        }
        b'b' => {
            let mut reader = reader;
            for item in decode::boolean_rle::BooleanIter::new(&mut reader, n) {
                match item {
                    Ok(v) => out.push_str(if v { "1\n" } else { "0\n" }),
                    Err(e) => {
                        println!("ERR {e:?}");
                        return;
                    }
                }
            }
        }
        other => {
            println!("ERR unknown mode {other}");
            return;
        }
    }
    print!("{out}");
}
