# bash completion for the clustering-tpu CLI
# (mirrors the reference tool's completion: mode names, then per-mode flags)
_clustering_tpu()
{
    local cur prev mode opts nopts fopts
    COMPREPLY=()
    cur="${COMP_WORDS[COMP_CWORD]}"
    prev="${COMP_WORDS[COMP_CWORD-1]}"
    mode="${COMP_WORDS[1]}"

    if [[ ${COMP_CWORD} -eq 1 ]]; then
        COMPREPLY=( $(compgen -W "density network mpp coring noise filter stats" -- "${cur}") )
        return 0
    fi

    case "${mode}" in
        density)
            opts="--file --output --input --population --free-energy --free-energy-input --nearest-neighbors --nearest-neighbors-input"
            nopts="--help --verbose"
            fopts="--radius --radii --threshold-screening --nthreads"
            ;;
        network)
            opts="--basename --output"
            nopts="--help --network-html --verbose"
            fopts="--minpop --min --max --step"
            ;;
        mpp)
            opts="--states --free-energy-input --concat-limits --tprob --output"
            nopts="--help --verbose"
            fopts="--lagtime --qmin-from --qmin-to --qmin-step --concat-nframes --nthreads"
            ;;
        coring)
            opts="--states --windows --output --distribution --cores --concat-limits"
            nopts="--help --verbose --iterative"
            fopts="--concat-nframes"
            ;;
        noise)
            opts="--states --output --basename --cores --concat-limits"
            nopts="--help --verbose"
            fopts="--cmin --concat-nframes"
            ;;
        filter)
            opts="--states --coords --output"
            nopts="--help --verbose"
            fopts="--selected-states --every-nth --nRandom"
            ;;
        stats)
            opts="--states --concat-limits"
            nopts="--help"
            fopts="--concat-nframes"
            ;;
        *)
            return 0
            ;;
    esac

    case "${prev}" in
        --file|-f|--states|-s|--coords|-c|--concat-limits|--tprob|--windows|-w|\
        --free-energy-input|-D|--nearest-neighbors-input|-B|--input|-i)
            COMPREPLY=( $(compgen -f -- "${cur}") )
            return 0
            ;;
    esac

    if [[ ${cur} == -* ]]; then
        COMPREPLY=( $(compgen -W "${opts} ${nopts} ${fopts}" -- "${cur}") )
        return 0
    fi
    COMPREPLY=( $(compgen -f -- "${cur}") )
}
complete -F _clustering_tpu clustering
