package graft.llmops

/** Base64 of files produced by the reference `lz4` command-line tool over
  * the same deterministic content as [[Bzip2Fixtures]] — plus a
  * hand-framed skippable frame gluing two frames, per the frame spec.
  */
private[llmops] object Lz4Fixtures {

  val cliTextL9: String =
    "BCJNGGRAp0wDAADxA2ZveCB0aGUgY29ycHVzIGRvZwQAYGp1bXBzIB0A8QVicm93biBwaXBl" +
    "bGluZSBxdWljazIAAhkAQWxhenkyAAATAAENAAUrAAAWAFRzcGFya10AACMARm92ZXIjAFR0" +
    "b2tlbh8AAnQAAUQAAhgABn8AQWRhdGEPAFNtb2RlbAYAAzcAApIAAmkAACMAASwAAjcAU3No" +
    "YXJkLgABWAACFwACMgABnwABIQADZAAmb2dAAANcAAJWAAJBAAG6AAiAAAFSAAMpAAJDAAEj" +
    "AABIAAEJAAI9AAhPAAEoAQHbAAaDAANRAQEWAAgsAAdfAQIOAQELAFJzY2FsYSgAAl8AAjUB" +
    "CUIBAFYAAxEABowBADIAArcABt8BAk0ACBQBAAABAhwACqgBB4YBB3wAB9cBADkABA8ABbwB" +
    "Al4BBUUABxUBB3ICARYABi4AAeYAAoMAB3cBJHRoLAICtAAEcwACDwICOgAGTQEAVwECsgAD" +
    "BwIH6AACWwAIAAEBYQAMMAEBhwACcgECXQAGQAECwgAHcAInb2dyAAKmAACgAAQYAAYsAwye" +
    "AAj7AQaEAgR7AgGdAAcPAQP7ASNvZwoACqwAAIoAAAQABRYAAq0ABQ8ABQkAArkABu8BA5UA" +
    "AOAABroBAGYABwMBB2oCCs4BCScDBtkABh0BDC8EBR0DBpAAAc0AB+4AAYsAAjgAAlADAZsA" +
    "L2hlmQMAC2ECAksAB0cEB1MCAlEACHIBCBIABwoCAhEAB9ADCEoCAdQBBIwEBnECCyQFCdYE" +
    "B8IDB94BAUUAA9gBAaUAAxgDBwwCAPMABkkBBw8ECe0DAucBBp4ACBIDB3EDAioBAVMAAQoA" +
    "BukDAzsEBEACCRUAB0ABB4QECaECCYUFCwgBCRwABsMDCWMAB6QABkABA94DCLIDAkUAAooF" +
    "C4oCCCEACPIFCDMABacGBjYEC0AABZoCC6IGBLQGArwACd0GDMIEB7oCBq0DB0IDDK4ECTcH" +
    "B4IDCQIGAw0AA7wFBiUAC3YFCI8DBt0DCw4EC8QABbQACNcBAj0ACQABAR8ACzUBCe4EC/IF" +
    "C5cDB9wGAhoAB6IDCqEGAg0CBnEFBrACB4oCC1gACI8FAgYABykHUG92ZXIKAAAAAIAoCPw="

  val cliRunsSized: String =
    "BCJNGGxA/gYAAAAAAAAhtgAAAJBhYmJiY2NjY2EBABNiAQAAEQAPAgDtABABDwIA/xYFMgIf" +
    "WgEA////1/EDZm94IHRoZSBjb3JwdXMgZG9nBABganVtcHMgHQDxBWJyb3duIHBpcGVsaW5l" +
    "IHF1aWNrMgACGQBBbGF6eTIAAEUAAQ0ABSsAAEwAVHNwYXJrXQAAIwBGb3Zlck4AVHRva2Vu" +
    "HwACdAABRAACGAAGfwBBZGF0YY4AU21vZGVsBgADswBgcXVpY2sgAAAAAJR130Y="

  val cliBinaryBX: String =
    "BCJNGHRAvbgLAIArkasveJ5zZUsMF33zJenUY8T9zHxLAjbZcFrtGX8+6UTtouLa5FHz5oR+" +
    "jfh6jOEnkniLq6MpRk12xE5tINTQqe7UH2nXxwrC9AO0mMfWcPlwi9/4Dsesz1TvQQ3JDSrb" +
    "RexdGYXCp2zop6zCjteBKfAJGrNyIxQPfmYKTnpA8jpv7oO8VTpTnzcNn8DLZSZ8NJo9FbHb" +
    "vSOuBtf6Nt25607eWor37t+JpX0sjuZ87cKsDv2mXflstYSuj40FYSt70Pp78/vlCC+Wcc98" +
    "nLzysNmptOiKnIB2PWKhPV5ibveNkDNjl3S4W5oHQIwXG5VA+zQGkfD14a5eGoH0OiHN+yUb" +
    "TUybK3881XPC5uKY25weMmpshylQelgmUAHR5vCVEHaTkOgkd4dl2TpzTIhIJB5UnZPgP++b" +
    "zov84CkU3aWADS51CokUWfDijlzf+y7wstGqpDVSqNL9k80S6C2hgaU7zgDs0xtguf/iGmiI" +
    "Q5Pg+D4OelGfB9AvczrsPE7/lYvU9/F86UrEYUUjjdSuiAGQmPpM5PewqsHppGB6xHfSFqLy" +
    "w8VN/RJAqTPhM+kHSdFPJvCHrcspqMKi+RIjeJN0Lt4yM+NVmQ4XphyWt7/cSn3SXFdZKMN7" +
    "/kl27ILrggTuk1Al4rCZ2YDpmmXE9zZ5w7eXlwvKjAQZ/pJ1tHBhgEYxFJ7hEbpDLpen1Flm" +
    "Q7uLVIP2l6067yZIc8u7LsoHhz/ovIbDvjd38QyncSDtmtE7RxcTm/w7MXhFxui91k/UMvrQ" +
    "jxC9b+PjeLkyvLcfy41hPugubAoZqnxAaSNqbneoSwGNSkKAWTgNQwe3eaUIWYcaQNc6IPPl" +
    "uTfncRaa6g8f9c3aN/vjJSmkSyFAjKbDlujcMjpu3Od0063ozNQwoNqggr9O8iIuKy/dMb5C" +
    "Hqg+0rXYGpOftDVsT/ZyN7O8Oo5z2w2IDlyLnq2zA1xJzSNIDy5uwNborlC9n6YrGk9QGSmL" +
    "4tn44tSLbjqw3DiR+Z0XcMocA2iabEaClKc9A/7cWULCdbUkyxXfCesnoNvP1ZQ6zwqmV+u5" +
    "Ld82fN/NKMqerXGqVic6Y7KzS3g0SoNlWE4mWvzt5aWhTeEi8OKbjBy0JZ7s5xMdvJInLsTs" +
    "FeZgpPNNH+Y0rytYFH7g4FG6vpDG0a0aqyGoMMWRgUyqKUiznshCK57AqEEv2LkJuZ5cba74" +
    "YnNGTyeXMxOsQ8BOU1xU4BbSunnjkeV3ep7wY7zh7JDD1lJmRoAa9r40P5EqUovmS98uceay" +
    "DdQbyr94xSm/cg6jMqtKRhOS8Ufw5QIoCYNuTNg4k3maPhh61uogOP8Ie0mV2wC0e9VfK7gi" +
    "CsfwFsa/gQi2IrB7NapEFrStWe31XUUg6hKWZxZmFaGey/KBEmGSthipiz+838zhxa1f/v68" +
    "iCrZKNxclqQ0KKeXnOTaVeOz5BW03owdJs+6UQ9J4BFAIni7ucQQTua9vuMnRrvLoI5/Og1f" +
    "/8Y8hoXkbZL7Zj5FJedY4yyjsSGUmVBZuXI+Zkd5/A24vO9CLCGey/XS0SVAoiXm7rBBXULd" +
    "HD9Om1RSpXOxkSiAZIxAmy9WTlesFQ4pF4dr1Q/+lJr3fc+Y6CUeUOHU9+1orkmgo7DMQr02" +
    "o3vuPojmfkgxGZTE1n9Rp6BhUf/v/53+Cy7J6ntutBgZkP3wkgQ33ESHu867F80aY7mTJcXm" +
    "jzxBMcm/rbtJZc0UFxNGqvLpTEeno1PJmaz6mfMIvKk41Z0N8od0GvVXwkt8EDhhCeGg1k3T" +
    "aNLxH0ZqpvTAoFjrr7WH92J+jphzmJNq+qL1soyTPsLKsEqUFZMoseKD9W1niotGN3p8GXN3" +
    "GjPTqfEzRgJQ0PP0ZpOkkh4tdhNZ1VoSy/1flBMEmDarkej8RO+LYjmpU+qDXwesl2JZz9qn" +
    "LM0wXkf0pX8DhcR45IiomgWFuHgfPO6dUc+fPJe8cXBE9E7ov9Txb34p5LknOR9nTFSn4jtp" +
    "+i7kHOhD1Okd7J0LyoIBbyUX2LAgHiPxEJLRXEXXv8PlwcApRLI8W8lBcgELmO3ZwnV+67FP" +
    "jWA5ENYIe2kiMxHkGH0WzeB3bxxHlHejpHmaSXHTmYwfWdr9GLDDo9XRTJnAXvJ7c5lJ7R3T" +
    "1UTGfIJoqSjmvS9hGonBFCVgb/VqqpsHbGE89Xxoy3qkkMLut52FuP7uMvCjaL2g0xdxSgiF" +
    "1ZdOZKh1wn3/rIP6++tWtFZH+l4eESYYA9NGdiJNBG/pvx73+QgD0gYIjJII3Fs2MUx7YoG1" +
    "iMsov8/rfHOZKRAvz8LB8xwEVyr/3qkwFXVs84oXJo8QW6EIaknLJ5lTe8epxEcosRsy33Ym" +
    "rsunD4vm+3S2wN1fwiuXfiUqiU7CTseiuDYuAp3juIo0Qyxf3OXQNA0ttS+mxQaV08YrfFbC" +
    "VkeJmon8SiBV3o3XmfcnuIB+/WTqNkWbA8qqwqjhq9xFmaRm9aBay6OV+3ymwI/JujpmXA3s" +
    "a+CVI9H/R5t7gU7YwSXl9c3WErgrN3+1VRbMqdw2BTKEcXHkv8jtTbAM9zWX1Cs7SLKfr+lp" +
    "97LzMeDnoyKZFjoLrzdUfFlRqdrsds9eX93KDmXm28cCbWmOIDRfu6Zk6jqG+qDGyDqytOpY" +
    "mCtEoDx6nDtdv0jG1kbE2F/5WFX6k0dfoeYbtwT4RWPE/dH71OP6VSoPcJUQjHOTVur9OTqJ" +
    "uxXhb9k0fpgQ5oayLOA8eWuz21RHaWkes49WpZWUiDBF0h6NQEN/SqR+yfpIidTA5yYvzo68" +
    "6PmnAS/qtyDLb9ts/YmlkaxC+K8YFzLrCD9Q4ekA22dDmlGML7iAKr5UGsqcd9suMABt9CdD" +
    "c+MEBK892EP0JHXELTQ0oLyZRsNESSMEVOGzbU3S4m8sM0c/xLPboUd+jSt/kQ2aaWDIlxt6" +
    "/cU5e/8kBriiQ8bXu1jxJQgiB4ZuFB7LktTYzSpOjiqeKGhPp8ghnt96HX0s3jvoHJ5ZPQZG" +
    "BVP+sYRVvkCJPA+r24sghif+6bgc/1W8UII0O3QBFgZ9F/G6xExbEtZypH/Vo4onvj0aW3IX" +
    "zSPukJ+nLOkEvGaVm3ztvPxkfU0D0Qx3sQSrAMCdNWl51vseSI8vFnbTvuorMETJJh/eQnmV" +
    "haHJp6Lni3cmZ0U3TzZU5u6g0D23aued7Yc9LlCbFG6nSy5/tsoZmYVZD8/nfzDsNEc+Bh9x" +
    "QmXNviuEJgshZeNBL6k+FewZVt3K/g/D2li1bV+Mj+RMEX2X/9L1HyyPxEbWZn8Jw7f1+LCk" +
    "xopcDaNwD48d8bd3UTN+e4gccMa1WFp5orcOtEhg/J5Z+xMuHHdwCvQAqWdCrlqlHgtLSDi6" +
    "Jb/KM6yapUVQ3/miWbZyWcGdlkFaAMgQXaJxNf5IqSd5saNVLavkBYdrfyKzgzcAGMXg1lXT" +
    "/MGzwDP1c1PnJRGWCqOFNSWvV8BSJi+t9w/cVN5QGzOpaWHRh5CYeTEZyftOG7gB2iyW9WYx" +
    "DWlXlSnyO53L8fqHLsZevcO9X+QWhuHuhnOJH00xK7DTdB/G1vN485koyhFLPeVYVWxiQBXY" +
    "KN5nS4SjIizGy6aN6gbWOdRMSzM2M5Kw0ofE+PITWI3OSc0Tyql5GfOJvgqsm5+P+zJ0RJni" +
    "pInVLWDibND4vxxRIZ/ORQ5YYmYdfxDpGbhljLztyz8Pe7765Frys7BThC6RDsUZU21xc2mJ" +
    "0QoE8kNYBHKBnIzYwLLrgW/umss0A7+QmDf2IKyNpo2FmGBMex3Oo0cN/peE1s/GEmGvcfO3" +
    "mVdcljHxQYRdqy1xtXKd16m+hZbtPPAbJPFjPcOY0xtNRmav0epJoVwp+apaoB0C54xrVlH6" +
    "LULe287b9MQCE2a/B6RhCQJ/c7CfQjTEnFUhF5iU6azeRK/6t2BUzgl0ckNsC1Y/uxPAghgY" +
    "NwoYO9Xjwj+B8k5pBJrXM4pG1jU8kDo2/mVmhme30ZdSFP5q9ql4AQZqMP6MAAAAAGow/ow="

  val cliSkipMulti: String =
    "UCpNGAYAAABpZ25vcmUEIk0YZECnTAMAAPEDZm94IHRoZSBjb3JwdXMgZG9nBABganVtcHMg" +
    "HQDxBWJyb3duIHBpcGVsaW5lIHF1aWNrMgACGQBBbGF6eTIAABMAAQ0ABSsAABYAVHNwYXJr" +
    "XQAAIwBGb3ZlciMAVHRva2VuHwACdAABRAACGAAGfwBBZGF0YQ8AU21vZGVsBgADNwACkgAC" +
    "aQAAIwABLAACNwBTc2hhcmQuAAFYAAIXAAIyAAGfAAEhAANkACZvZ0AAA1wAAlYAAkEAAboA" +
    "CIAAAVIAAykAAkMAASMAAEgAAQkAAj0ACE8AASgBAdsABoMAA1EBARYACCwAB18BAg4BAQsA" +
    "UnNjYWxhKAACXwACNQEJQgEAVgADEQAGjAEAMgACtwAG3wECTQAIFAEAAAECHAAKqAEHhgEH" +
    "fAAH1wEAOQAEDwAFvAECXgEFRQAHFQEHcgIBFgAGLgAB5gACgwAHdwEkdGgsAgK0AARzAAIP" +
    "AgI6AAZNAQBXAQKyAAMHAgfoAAJbAAgAAQFhAAwwAQGHAAJyAQJdAAZAAQLCAAdwAidvZ3IA" +
    "AqYAAKAABBgABiwDDJ4ACPsBBoQCBHsCAZ0ABw8BA/sBI29nCgAKrAAAigAABAAFFgACrQAF" +
    "DwAFCQACuQAG7wEDlQAA4AAGugEAZgAHAwEHagIKzgEJJwMG2QAGHQEMLwQFHQMGkAABzQAH" +
    "7gABiwACOAACUAMBmwAvaGWZAwALYQICSwAHRwQHUwICUQAIcgEIEgAHCgICEQAH0AMISgIB" +
    "1AEEjAQGcQILJAUJ1gQHwgMH3gEBRQAD2AEBpQADGAMHDAIA8wAGSQEHDwQJ7QMC5wEGngAI" +
    "EgMHcQMCKgEBUwABCgAG6QMDOwQEQAIJFQAHQAEHhAQJoQIJhQULCAEJHAAGwwMJYwAHpAAG" +
    "QAED3gMIsgMCRQACigULigIIIQAI8gUIMwAFpwYGNgQLQAAFmgILogYEtAYCvAAJ3QYMwgQH" +
    "ugIGrQMHQgMMrgQJNwcHggMJAgYDDQADvAUGJQALdgUIjwMG3QMLDgQLxAAFtAAI1wECPQAJ" +
    "AAEBHwALNQEJ7gQL8gULlwMH3AYCGgAHogMKoQYCDQIGcQUGsAIHigILWAAIjwUCBgAHKQdQ" +
    "b3ZlcgoAAAAAgCgI/AQiTRhsQP4GAAAAAAAAIbYAAACQYWJiYmNjY2NhAQATYgEAABEADwIA" +
    "7QAQAQ8CAP8WBTICH1oBAP///9fxA2ZveCB0aGUgY29ycHVzIGRvZwQAYGp1bXBzIB0A8QVi" +
    "cm93biBwaXBlbGluZSBxdWljazIAAhkAQWxhenkyAABFAAENAAUrAABMAFRzcGFya10AACMA" +
    "Rm92ZXJOAFR0b2tlbh8AAnQAAUQAAhgABn8AQWRhdGGOAFNtb2RlbAYAA7MAYHF1aWNrIAAA" +
    "AACUdd9G"


  /** `lz4 -9 -B4 -BD` — block-LINKED frame (FLG bit 0x20 clear, the
    * LZ4F library default): 150 000 bytes of periodic text in three
    * 64 KB blocks whose matches reach into prior blocks' output.
    */
  val cliLinkedBD: String =
    """BCJNGERAXpsBAADwEHRoZSBxdWljayBicm93biBmb3gganVtcHMgb3ZlciAfAPIcbGF6eSBkb2cg
d2hpbGUgY29ycHVzIHNoYXJkcyBzdHJlYW0gdGhyb3VnaDAA8CFpbmtlZCBmcmFtZSBkZWNvZGVy
IGFuZCBoaXN0b3J5IHdpbmRvd3Mgc3BhbiBibG99AL9vdW5kYXJpZXMuIJMA////////////////
////////////////////////////////////////////////////////////////////////////
////////////////////////////////////////////////////////////////////////////
////////////////////////////////////////////////////////////////////////////
////////////////////////////////////////////////////////////////////////////
/////////////////////1VQd2luZG8KAQAAD5MA////////////////////////////////////
////////////////////////////////////////////////////////////////////////////
////////////////////////////////////////////////////////////////////////////
////////////////////////////////////////////////////////////////////////////
////////////////////////////////////////////////////////////////////////////
/+hQZnJhbWVUAAAAD5MA////////////////////////////////////////////////////////
//////////////////////////////////////////8iUHMgc2hhAAAAAOMwBFA="""
}
